"""WebDataset-style tar shards (r7): executor-built tar archives of
(image, caption) samples with a checksummed manifest, distributed
re-read via binaryFile + member explode, sample regrouping, and the
manifest audit. Roundtrip is byte-exact and shard bytes are
deterministic across rebuilds."""

from __future__ import annotations

import hashlib
import json
import os
import tarfile

from geoestate_etl_spark.operators.multimodal import make_png
from geoestate_etl_spark.sources.tar_shards import (
    group_samples,
    read_tar_shards,
    verify_tar_shards,
    write_tar_shards,
)

MEMBERS = {"png": "image", "txt": "caption"}


def _rows(n):
    rows = []
    for i in range(n):
        rows.append(
            (
                f"{i:06d}",
                bytearray(make_png(4 + i % 5, 3 + i % 4)),
                None if i % 7 == 3 else f"caption for sample {i}",
            )
        )
    return rows


def _df(spark, n):
    return spark.createDataFrame(
        _rows(n), "key string, image binary, caption string"
    )


def test_write_read_roundtrip_and_manifest(spark, tmp_path):
    out = str(tmp_path / "wds")
    manifest = write_tar_shards(_df(spark, 40), out, 3, member_cols=MEMBERS)

    assert manifest["total_samples"] == 40
    assert sorted(os.listdir(out)) == [
        "manifest.json", "shard-00000.tar", "shard-00001.tar", "shard-00002.tar",
    ]
    disk = json.load(open(os.path.join(out, "manifest.json")))
    assert disk == manifest
    assert sum(s["n_samples"] for s in manifest["shards"]) == 40
    # every sample has a png member; 34 have captions (i%7==3 skipped)
    assert sum(s["n_members"] for s in manifest["shards"]) == 40 + 34

    # the tars are REAL webdataset shards a non-Spark loader can open:
    # members of one key adjacent, sorted by key within the shard
    with tarfile.open(os.path.join(out, "shard-00000.tar")) as tar:
        names = [m.name for m in tar]
    stems = [n.rsplit(".", 1)[0] for n in names]
    assert stems == sorted(stems, key=lambda s: (s, ))  # non-decreasing
    for a, b in zip(names, names[1:]):
        if a.rsplit(".", 1)[0] == b.rsplit(".", 1)[0]:
            continue  # same sample: adjacent ✓

    # distributed re-read → regroup → byte-exact against the source
    members = read_tar_shards(spark, out)
    samples = {
        r.key: dict(r.members) for r in group_samples(members).collect()
    }
    assert len(samples) == 40
    for key, image, caption in _rows(40):
        got = samples[key]
        assert bytes(got["png"]) == bytes(image)
        if caption is None:
            assert "txt" not in got
        else:
            assert bytes(got["txt"]).decode() == caption

    # manifest audit passes for every shard
    ok = verify_tar_shards(spark, out)
    assert [(r.shard, r.ok) for r in ok.orderBy("shard").collect()] == [
        (0, True), (1, True), (2, True),
    ]

    # shuffle-free sample read: identical samples, ZERO exchanges —
    # the media bytes never move (keys are tar-adjacent by contract)
    from geoestate_etl_spark.sources.tar_shards import read_tar_samples

    direct = read_tar_samples(spark, out)
    plan = direct._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = {r.key: dict(r.members) for r in direct.collect()}
    assert got == samples


def test_stream_tar_shards_incremental(spark, tmp_path):
    """Streaming WebDataset consumption: a producer publishes shards
    into a landing dir; each AvailableNow pass explodes ONLY the tars
    that arrived since the checkpoint — the exactly-once shard loader
    shape."""
    from geoestate_etl_spark.sources.tar_shards import stream_tar_shards

    land = str(tmp_path / "land")
    out = str(tmp_path / "members")
    cp = str(tmp_path / "cp")
    os.makedirs(land)

    # producer drop 1: shards 0..1 of a 12-sample corpus
    write_tar_shards(_df(spark, 12), land, 2, member_cols=MEMBERS)
    q = (
        stream_tar_shards(spark, land)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    first = spark.read.parquet(out)
    n_first = first.count()
    assert first.select("key").distinct().count() == 12

    # producer drop 2: a NEW shard file (different corpus slice under
    # new names so it lands as shard-00002)
    extra = spark.createDataFrame(
        [("zz0001", bytearray(make_png(6, 6)), "late sample")],
        "key string, image binary, caption string",
    )
    write_tar_shards(extra, land + "/late", 1, member_cols=MEMBERS)
    os.replace(
        os.path.join(land, "late", "shard-00000.tar"),
        os.path.join(land, "shard-00002.tar"),
    )
    q2 = (
        stream_tar_shards(spark, land)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(120)
    after = spark.read.parquet(out)
    assert after.count() == n_first + 2  # png + txt of the late sample only
    assert after.filter("key = 'zz0001'").count() == 2


def test_rewrite_same_path_sweeps_stale_shards(spark, tmp_path):
    """ADVICE r7 (medium): rewriting a corpus to the same path with
    FEWER shards must not leave stale shard files for the glob readers
    to mix in — the writer sweeps non-manifest shard-*.tar after the
    manifest publish, and a fresh read serves exactly the new corpus."""
    out = str(tmp_path / "wds")
    write_tar_shards(_df(spark, 40), out, 5, member_cols=MEMBERS)
    assert len([f for f in os.listdir(out) if f.endswith(".tar")]) == 5

    # second corpus: different rows, fewer shards, same path
    small = spark.createDataFrame(
        [(f"n{i:04d}", bytearray(make_png(5, 5)), f"v2 {i}") for i in range(8)],
        "key string, image binary, caption string",
    )
    manifest = write_tar_shards(small, out, 2, member_cols=MEMBERS)
    tars = sorted(f for f in os.listdir(out) if f.endswith(".tar"))
    assert tars == ["shard-00000.tar", "shard-00001.tar"]  # stale swept
    assert manifest["total_samples"] == 8
    # readers see ONLY the new corpus
    got = {r.key for r in read_tar_shards(spark, out).select("key").distinct().collect()}
    assert got == {f"n{i:04d}" for i in range(8)}
    ok = verify_tar_shards(spark, out)
    assert all(r.ok for r in ok.collect())


def test_all_null_sample_dropped_and_planted_shard_flagged(spark, tmp_path):
    """ADVICE r7 (low): a sample whose member columns are all NULL
    emits no tar member, so it must not count toward the manifest
    (it would make the shard unverifiable forever). And an on-disk
    shard file the manifest does not list is an audit failure."""
    out = str(tmp_path / "wds")
    rows = [
        ("a01", bytearray(make_png(4, 4)), "hello"),
        ("a02", None, None),  # all-NULL: dropped
        ("a03", None, "text only"),  # partial: kept
    ]
    df = spark.createDataFrame(rows, "key string, image binary, caption string")
    manifest = write_tar_shards(df, out, 1, member_cols=MEMBERS)
    assert manifest["total_samples"] == 2
    ok = verify_tar_shards(spark, out)
    assert [(r.shard, r.ok) for r in ok.collect()] == [(0, True)]

    # plant a shard file (distinct keys) the manifest does not list
    planted = spark.createDataFrame(
        [("zz01", bytearray(make_png(4, 4)), "planted")],
        "key string, image binary, caption string",
    )
    side = str(tmp_path / "side")
    write_tar_shards(planted, side, 1, member_cols=MEMBERS)
    os.replace(
        os.path.join(side, "shard-00000.tar"),
        os.path.join(out, "shard-00099.tar"),
    )
    rows = verify_tar_shards(spark, out).orderBy("shard").collect()
    assert [(r.shard, r.ok) for r in rows] == [(-1, False), (0, True)]


def test_audit_flags_empty_and_corrupt_shards(spark, tmp_path):
    """r8 review: a planted EMPTY tar (valid, zero members) yields no
    member rows and must still be flagged via the directory listing;
    a structurally CORRUPT listed shard must be REPORTED ok=false by
    the lenient audit explode, not crash the whole verify job."""
    import io as _io
    import tarfile as _tarfile

    out = str(tmp_path / "wds")
    write_tar_shards(_df(spark, 10), out, 2, member_cols=MEMBERS)

    # planted empty-but-valid tar: zero member rows, listing catches it
    buf = _io.BytesIO()
    with _tarfile.open(fileobj=buf, mode="w"):
        pass
    open(os.path.join(out, "shard-00077.tar"), "wb").write(buf.getvalue())
    rows = verify_tar_shards(spark, out).orderBy("shard").collect()
    assert [(r.shard, r.ok) for r in rows] == [(-1, False), (0, True), (1, True)]
    os.remove(os.path.join(out, "shard-00077.tar"))

    # structurally corrupt LISTED shard: truncate to garbage
    target = os.path.join(out, "shard-00001.tar")
    open(target, "wb").write(b"\x00garbage not a tar header")
    rows = verify_tar_shards(spark, out).orderBy("shard").collect()
    assert [(r.shard, r.ok) for r in rows] == [(0, True), (1, False)]
    # the READER path keeps honest-error semantics on the same input
    import pytest as _pytest

    with _pytest.raises(Exception):
        read_tar_shards(spark, out).count()


def test_shard_bytes_deterministic_and_audit_catches_tamper(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_tar_shards(_df(spark, 25), a, 2, member_cols=MEMBERS)
    write_tar_shards(_df(spark, 25), b, 2, member_cols=MEMBERS)

    def digests(d):
        return {
            f: hashlib.sha256(open(os.path.join(d, f), "rb").read()).hexdigest()
            for f in sorted(os.listdir(d))
            if f.endswith(".tar")
        }

    assert digests(a) == digests(b)  # rebuild-stable bytes

    # tamper one member inside one shard: the audit must flag exactly it
    target = os.path.join(a, "shard-00001.tar")
    blob = bytearray(open(target, "rb").read())
    # flip a byte inside the first png member's payload (tar header is
    # 512 bytes; payload follows)
    blob[512 + 40] ^= 0xFF
    open(target, "wb").write(bytes(blob))
    ok = {r.shard: r.ok for r in verify_tar_shards(spark, a).collect()}
    assert ok[0] is True and ok[1] is False

def test_xor64_matches_jvm_bit_xor(spark):
    """The writer folds the per-row member hash executor-side with
    ``_xor64`` (r9 single-scan write); it must stay bit-identical to
    the JVM ``bit_xor`` it replaced, including sign-bit patterns."""
    import pyspark.sql.functions as F

    from geoestate_etl_spark.sources.tar_shards import _xor64

    vals = [
        0, 1, -1, 2**63 - 1, -(2**63), 0x1234_5678_9ABC_DEF0,
        -0x0FED_CBA9_8765_4321, 42,
    ]
    jvm = (
        spark.createDataFrame([(v,) for v in vals], "v long")
        .agg(F.bit_xor("v"))
        .first()[0]
    )
    assert _xor64(vals) == int(jvm)
