"""WebDataset-style TAR shards for multimodal training data.

Training loaders for image/audio/text-pair corpora read **tar
archives of named members** sequentially (the WebDataset convention:
members ``<key>.<ext>`` — ``000017.png`` + ``000017.txt`` + … — and
consecutive members of one ``key`` form one sample). Tars beat
millions of loose files at 100 TB because a loader streams one large
sequential object per worker instead of issuing one storage GET per
sample, and beat parquet for this tier because samples stay
individually addressable bytes a non-Spark loader (PyTorch
DataLoader, webdataset) consumes with zero deserialization logic.

This module is the Spark-side of that contract, both directions:

- :func:`write_tar_shards` — a DataFrame of media rows
  ``(key, {ext: bytes, ...})`` lands as ``shard-%05d.tar`` files plus
  a JSON manifest (per-shard sample counts + order-independent
  content checksum, same discipline as ``sources/shards.py``). Shard
  assignment is a deterministic hash/range of the key (one shuffle,
  rows move straight to their shard's writer); each tar is built on
  an EXECUTOR with stdlib ``tarfile`` inside ``applyInPandas`` —
  bytes never visit the driver.
- :func:`read_tar_shards` — ``binaryFile`` over ``*.tar`` (whole-tar
  rows, non-splittable — exactly the sequential-read unit the format
  is designed around) exploded into one row per member via
  Arrow-batched ``mapInPandas``; :func:`group_samples` re-groups
  members into ``(key, {ext: bytes})`` samples with one hash
  aggregation.

Scale notes: shard size is the parallelism quantum for BOTH training
and re-reading (pick rows_per_shard so shards land near 100-500 MB);
a tar is read by one task, so total read parallelism == shard count.
Executor-side tar writes go to the shared filesystem/object store
path the same way the prepared store and parquet writers do; the
write is idempotent per (shard, content) and the manifest commit is
the atomic publish step (write-then-rename).

The reference (GeoEstate-ETL) has no media surface; this belongs to
the training-data-pipeline extension tier alongside
``sources/binary_source.py`` and ``streaming/media_ingest.py``.
"""

from __future__ import annotations

import io
import json
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "write_tar_shards",
    "read_tar_shards",
    "read_tar_samples",
    "stream_tar_shards",
    "group_samples",
    "verify_tar_shards",
]


_MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("shard_path", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField("ext", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ]
)

_WRITE_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_members", T.LongType()),
        T.StructField("tar_bytes", T.LongType()),
        T.StructField("checksum", T.LongType()),
    ]
)


def _xor64(values) -> int:
    """Order-independent XOR of signed-64 hash values — the Python
    twin of ``F.bit_xor`` over a LongType column (bit-identical: XOR
    is bitwise, so two's-complement signedness is irrelevant as long
    as the 64-bit pattern is preserved)."""
    acc = 0
    for v in values:
        acc ^= int(v) & 0xFFFFFFFFFFFFFFFF
    return acc - (1 << 64) if acc >= (1 << 63) else acc


def write_tar_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "key",
    member_cols: dict[str, str] | None = None,
) -> dict:
    """Write ``<path>/shard-%05d.tar`` + ``<path>/manifest.json``.

    ``df`` carries one row per SAMPLE: a string ``key_col`` plus one
    binary/string column per member extension, mapped by
    ``member_cols`` (e.g. ``{"png": "image", "txt": "caption"}`` —
    tar member ``<key>.png`` gets column ``image``'s bytes). Shard =
    ``xxhash64(key) % n_shards``: deterministic across runs and
    layouts, one shuffle total. NULL members are skipped (a sample
    may lack an annotation). Returns the manifest dict.

    Each shard's tar is assembled in one ``applyInPandas`` group on an
    executor — members sorted by key within the shard so consecutive
    members of one sample stay adjacent (the WebDataset contract) and
    rebuilds are byte-stable. Deterministic tar metadata (zeroed
    mtime/uid) keeps shard bytes reproducible, so the manifest's
    content checksum doubles as a rebuild-drift gate.
    """
    if member_cols is None:
        member_cols = {"bin": "content"}
    os.makedirs(path, exist_ok=True)
    exts = sorted(member_cols)

    # ADVICE r7: a sample whose member columns are ALL NULL would be
    # counted in n_samples + the checksum yet emit zero tar members —
    # readers could never reproduce the manifest and verify would
    # report the shard tampered forever. Drop them before assignment.
    any_present = F.lit(False)
    for e in exts:
        any_present = any_present | F.col(member_cols[e]).isNotNull()
    df = df.where(any_present)

    # order-independent per-shard content checksum over the SOURCE
    # rows (not the tar bytes), computed JVM-side BEFORE the shard
    # shuffle and XOR-folded INSIDE the tar-writing pass — one scan of
    # the binary-heavy frame produces tars AND checksums (r9: the old
    # shape persisted the payload frame and scanned it twice, once per
    # aggregate — guide §2.3, decide on metadata, touch bytes once)
    member_hash = F.xxhash64(
        F.col(key_col), *[F.col(member_cols[e]) for e in exts]
    )
    assigned = df.withColumn(
        "_shard",
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards)).cast("long"),
    ).withColumn("_mh", member_hash)

    def _write(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["_shard"].iloc[0])
        pdf = pdf.sort_values(key_col, kind="mergesort")
        buf = io.BytesIO()
        n_members = 0
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for _, row in pdf.iterrows():
                for ext in exts:
                    val = row[member_cols[ext]]
                    if val is None or (isinstance(val, float) and pd.isna(val)):
                        continue
                    data = (
                        val.encode("utf-8") if isinstance(val, str) else bytes(val)
                    )
                    info = tarfile.TarInfo(name=f"{row[key_col]}.{ext}")
                    info.size = len(data)
                    info.mtime = 0  # deterministic bytes
                    tar.addfile(info, io.BytesIO(data))
                    n_members += 1
        data = buf.getvalue()
        tmp = os.path.join(path, f".shard-{shard:05d}.tar.tmp-{os.getpid()}")
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, os.path.join(path, f"shard-{shard:05d}.tar"))
        return pd.DataFrame(
            [(shard, len(pdf), n_members, len(data), _xor64(pdf["_mh"]))],
            columns=["shard", "n_samples", "n_members", "tar_bytes", "checksum"],
        )

    # sort the ≤ n_shards stat rows on the driver: an orderBy here cost
    # a range-partitioning exchange (+ its sampling pass) for a handful
    # of rows (r10)
    stats = sorted(
        assigned.groupBy("_shard").applyInPandas(_write, _WRITE_SCHEMA).collect(),
        key=lambda r: r.shard,
    )
    sums = {int(r.shard): int(r.checksum) for r in stats}
    manifest = {
        "format": "webdataset-tar",
        "n_shards": n_shards,
        "key_col": key_col,
        "member_cols": member_cols,
        "total_samples": int(sum(r.n_samples for r in stats)),
        "shards": [
            {
                "shard": int(r.shard),
                "file": f"shard-{int(r.shard):05d}.tar",
                "n_samples": int(r.n_samples),
                "n_members": int(r.n_members),
                "tar_bytes": int(r.tar_bytes),
                "checksum": sums[int(r.shard)],
            }
            for r in stats
        ],
    }
    tmp = os.path.join(path, ".manifest.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, os.path.join(path, "manifest.json"))
    # ADVICE r7: rewriting a corpus to the same path with fewer shards
    # (or a shard drawing zero rows this run) must not leave stale
    # shard-*.tar files the glob readers would silently mix with the
    # new corpus. Sweep AFTER the manifest publish so the live
    # manifest never references a deleted file.
    produced = {s["file"] for s in manifest["shards"]}
    for fname in os.listdir(path):
        if (
            fname.startswith("shard-")
            and fname.endswith(".tar")
            and fname not in produced
        ):
            try:
                os.remove(os.path.join(path, fname))
            except OSError:
                pass
    return manifest


def read_tar_shards(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WebDataset read: ``binaryFile`` over
    ``shard-*.tar`` (one whole tar per row — the sequential-read
    unit), exploded to one row per member:
    ``(shard_path, key, ext, content)``."""
    tars = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "shard-*.tar")
        .load(path)
        .select("path", "content")
    )
    return _explode_members(tars)


def stream_tar_shards(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin of :func:`read_tar_shards`: tail a shard
    landing directory with ``readStream`` — each NEW tar that a
    producer publishes becomes one micro-batch unit and explodes into
    member rows (the member explode is a stateless row transform, so
    it runs inside the stream). Compose with a file-sink writeStream
    for an exactly-once shard-to-table loader, or with
    ``streaming/media_ingest``-style decode stages."""
    from geoestate_etl_spark.streaming.media_ingest import BINARY_FILE_SCHEMA

    tars = (
        spark.readStream.format("binaryFile")
        .schema(BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", "shard-*.tar")
        .load(path)
        .select("path", "content")
    )
    return _explode_members(tars)


def _explode_members(tars: DataFrame, lenient: bool = False) -> DataFrame:
    """``lenient`` is for the AUDIT path only: a structurally corrupt
    tar yields zero member rows (so verify reports its shard
    ok=false via the count/checksum mismatch) instead of failing the
    whole job. Readers keep the honest-error default — a training
    loader must stop on corrupt input, not silently skip it."""

    def _explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                try:
                    with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tar:
                        for m in tar:
                            if not m.isfile():
                                continue
                            stem, dot, ext = m.name.rpartition(".")
                            rows.append(
                                (
                                    p,
                                    stem if dot else m.name,
                                    ext if dot else "",
                                    tar.extractfile(m).read(),
                                )
                            )
                except (tarfile.TarError, OSError, EOFError):
                    if not lenient:
                        raise
            yield pd.DataFrame(
                rows, columns=["shard_path", "key", "ext", "content"]
            )

    return tars.mapInPandas(_explode, _MEMBER_SCHEMA)


def group_samples(members: DataFrame) -> DataFrame:
    """Members → samples: ``(key, members: map<ext, binary>)`` via one
    hash aggregation (the inverse of the writer's member fan-out).

    Scale note: this SHUFFLES every member's bytes by key. When the
    members came from :func:`read_tar_shards` that shuffle is pure
    waste — one key's members are adjacent inside one tar by the
    WebDataset contract — so prefer :func:`read_tar_samples`, which
    assembles samples during the sequential tar walk with ZERO
    shuffle. This aggregation remains the right tool for member
    frames from other origins (filtered/unioned member tables)."""
    return members.groupBy("key").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("ext"), F.col("content")))
        ).alias("members")
    )


_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("shard_path", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField(
            "members", T.MapType(T.StringType(), T.BinaryType())
        ),
    ]
)


def _walk_samples(tars: DataFrame, lenient: bool = False) -> DataFrame:
    """Sequential tar walk → ``(shard_path, key, members)`` sample
    rows; consecutive members of one key form one sample (the
    WebDataset contract the writer enforces by sorting). ``lenient``
    is for the AUDIT path only: a structurally corrupt tar yields only
    the samples read before the corruption point — the in-progress
    partial sample is dropped, and the count/checksum mismatch flags
    the shard — instead of failing the job."""

    def _samples(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                cur_key, cur = None, {}
                try:
                    with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tar:
                        for m in tar:
                            if not m.isfile():
                                continue
                            stem, dot, ext = m.name.rpartition(".")
                            key = stem if dot else m.name
                            if key != cur_key and cur_key is not None:
                                rows.append((p, cur_key, cur))
                                cur = {}
                            cur_key = key
                            cur[ext if dot else ""] = tar.extractfile(m).read()
                except (tarfile.TarError, OSError, EOFError):
                    if not lenient:
                        raise
                    cur_key = None  # drop the partial sample too
                if cur_key is not None:
                    rows.append((p, cur_key, cur))
            yield pd.DataFrame(
                rows, columns=["shard_path", "key", "members"]
            )

    return tars.mapInPandas(_samples, _SAMPLE_SCHEMA)


def read_tar_samples(spark: SparkSession, path: str) -> DataFrame:
    """Shuffle-free sample read: ``(shard_path, key, members:
    map<ext, binary>)`` assembled DURING the sequential tar walk —
    consecutive members of one key form one sample (the WebDataset
    contract the writer enforces by sorting), so no exchange ever
    moves the media bytes. At 100 TB this is the difference between
    a scan and a full-corpus shuffle; the plan is asserted
    Exchange-free in ``tests/test_tar_shards.py``."""
    tars = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "shard-*.tar")
        .load(path)
        .select("path", "content")
    )
    return _walk_samples(tars)


def verify_tar_shards(
    spark: SparkSession, path: str, member_cols: dict[str, str] | None = None
) -> DataFrame:
    """Re-read every shard and compare sample counts + the
    order-independent member checksum against the manifest. Returns
    ``(shard, ok, rows_expected, rows_read)`` — the audit a training
    job runs before trusting a corpus drop."""
    with open(os.path.join(path, "manifest.json")) as fh:
        manifest = json.load(fh)
    member_cols = member_cols or manifest["member_cols"]
    exts = sorted(member_cols)
    # lenient sample walk: the audit must REPORT a corrupt shard, not
    # die on it (r8 review) — zero rows from a listed shard fails its
    # count check below. Samples are assembled DURING the sequential
    # walk (the writer sorts members by key), so the audit is ONE pass
    # over the tar bytes with no exchange ever moving them: only the
    # 8-byte per-sample hash reaches the per-shard aggregation (r9 —
    # the old path re-grouped members by key, shuffling every payload
    # byte, and executed the tar explode twice: once for the grouping,
    # once for the shard_path rejoin).
    tars = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "shard-*.tar")
        .load(path)
        .select("path", "content")
    )
    samples = _walk_samples(tars, lenient=True)
    # rebuild each sample row's member tuple in the writer's column
    # order; hash parity with the writer's source-row checksum holds
    # because xxhash64 hashes a string's UTF-8 bytes and a binary's
    # raw bytes identically, so a text member read back as binary
    # still matches the string column it was written from
    cols = [F.col("key")]
    for ext in exts:
        c = F.col("members").getItem(ext)
        cols.append(c)
    got = (
        samples.select(
            "shard_path", F.xxhash64(*cols).alias("_h")
        )
        .groupBy("shard_path")
        .agg(
            F.count(F.lit(1)).alias("rows_read"),
            F.bit_xor("_h").alias("checksum"),
        )
        .collect()
    )
    by_file = {os.path.basename(r.shard_path): r for r in got}
    rows = []
    for s in manifest["shards"]:
        r = by_file.get(s["file"])
        rows.append(
            (
                s["shard"],
                r is not None
                and r.rows_read == s["n_samples"]
                and int(r.checksum) == s["checksum"],
                s["n_samples"],
                0 if r is None else int(r.rows_read),
            )
        )
    # ADVICE r7: an on-disk shard-*.tar the manifest does NOT list
    # (stale from an earlier write, or planted) is itself an audit
    # failure — the glob readers would serve it. Detected from the
    # DIRECTORY LISTING, not the parsed rows (r8 review: an empty or
    # unparseable planted tar yields no rows and would evade a
    # rows-based check). shard=-1, ok=false.
    expected = {s["file"] for s in manifest["shards"]}
    on_disk = {
        f
        for f in os.listdir(path)
        if f.startswith("shard-") and f.endswith(".tar")
    }
    for fname in sorted(on_disk - expected):
        r = by_file.get(fname)
        rows.append((-1, False, 0, 0 if r is None else int(r.rows_read)))
    return spark.createDataFrame(
        rows, "shard long, ok boolean, rows_expected long, rows_read long"
    )
