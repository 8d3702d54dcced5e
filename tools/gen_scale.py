"""Synthesize sf0.3 / sf1.0 scale variants of the driver testdata
(r6 — VERDICT r5 #4: scale-sweep evidence).

The driver's parquet at /root/testdata is read-only and tops out at
sf0.1; measuring scaling exponents needs at least two more decades of
x. This generator extends sf0.1 by factor k into
data/scale/sf{0.3,1.0}/ (gitignored — regenerate with
``python tools/gen_scale.py``):

- region/nation: copied verbatim (fixed dimensions).
- supplier/customer/part/orders/lineitem/events: k stacked copies of
  sf0.1 with key-space offsets (orderkey/custkey/partkey/suppkey/
  event_id/user_id shifted by copy·(max+1)) — foreign keys stay
  consistent within each copy, so joins and group-bys see k× keys and
  k× rows with the same per-key fan-out, which is exactly how a real
  warehouse grows.
- documents: REGENERATED (not copied — a copied text corpus would be
  a wall of cross-copy near-duplicates and near_dup_pairs would
  measure an artifact, k²·n pairs, instead of growth): same ~30-word
  vocabulary, length and language mix as the source, with a planted
  linear near-dup density — every id%10==7 doc is a light mutation of
  its id-7 neighbor and every id%10==9 doc duplicates id-9 with a new
  prefix token, mirroring the source's planted-duplicate character.
- embeddings: regenerated unit-scale float32[64] with the source's
  label alphabet; every id%17==13 vector is a small perturbation of
  id-13 (a planted semantic near-dup, linear density).

Deterministic (fixed seeds) so repeated runs produce identical bytes
and the scaling table stays reproducible.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "scale")

#: source-table key columns to offset per stacked copy
OFFSETS = {
    "supplier": {"s_suppkey": "s_suppkey"},
    "customer": {"c_custkey": "c_custkey"},
    "part": {"p_partkey": "p_partkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {
        "l_orderkey": "o_orderkey",
        "l_partkey": "p_partkey",
        "l_suppkey": "s_suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
}

#: where each offset base lives: (table, column) whose max+1 is the stride
BASES = {
    "s_suppkey": ("supplier", "s_suppkey"),
    "c_custkey": ("customer", "c_custkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
}


def _stack(con: duckdb.DuckDBPyConnection, table: str, k: int, out_dir: str) -> None:
    strides = {}
    for col, base in OFFSETS[table].items():
        bt, bc = BASES[base]
        (mx,) = con.execute(
            f"SELECT max({bc}) FROM read_parquet('{SRC}/{bt}.parquet')"
        ).fetchone()
        strides[col] = int(mx) + 1
    cols = con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{table}.parquet')"
    ).df()["column_name"].tolist()
    sel = ", ".join(
        f"{c} + c.i * {strides[c]} AS {c}" if c in strides else c for c in cols
    )
    con.execute(
        f"COPY (SELECT {sel} FROM read_parquet('{SRC}/{table}.parquet'), "
        f"(SELECT unnest(range({k})) AS i) c ORDER BY c.i) "
        f"TO '{out_dir}/{table}.parquet' (FORMAT PARQUET)"
    )


VOCAB = None  # extracted once from the source corpus


def _gen_documents(con, k: int, out_dir: str, seed: int) -> None:
    global VOCAB
    if VOCAB is None:
        VOCAB = [
            w
            for (w,) in con.execute(
                "SELECT DISTINCT w FROM (SELECT unnest(string_split(text, ' ')) AS w "
                f"FROM read_parquet('{SRC}/documents.parquet')) "
                "WHERE w <> '' ORDER BY 1"
            ).fetchall()
        ]
    langs = ["en", "en", "en", "en", "de", "zh", "es", "fr"]  # ~en-heavy mix
    rng = np.random.default_rng(seed)
    n = 5000 * k
    lens = rng.integers(8, 110, n)
    texts: list[str] = []
    for i in range(n):
        if i % 10 == 7 and i >= 7:  # light mutation of a neighbor
            base = texts[i - 7].split(" ")
            j = int(rng.integers(0, len(base)))
            base[j] = VOCAB[int(rng.integers(0, len(VOCAB)))]
            texts.append(" ".join(base))
        elif i % 10 == 9 and i >= 9:  # duplicate with a prefix token
            texts.append(VOCAB[i % len(VOCAB)] + " " + texts[i - 9])
        else:
            idx = rng.integers(0, len(VOCAB), int(lens[i]))
            texts.append(" ".join(VOCAB[j] for j in idx))
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array([langs[i % len(langs)] for i in range(n)]),
            "source": pa.array([f"src{i % 10}" for i in range(n)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{out_dir}/documents.parquet")


def _gen_embeddings(con, k: int, out_dir: str, seed: int) -> None:
    (n_labels,) = con.execute(
        f"SELECT count(DISTINCT label) FROM read_parquet('{SRC}/embeddings.parquet')"
    ).fetchone()
    rng = np.random.default_rng(seed + 1)
    n, dim = 2000 * k, 64
    v = rng.standard_normal((n, dim)).astype(np.float32)
    for i in range(13, n, 17):  # planted semantic near-dups, linear density
        v[i] = v[i - 13] + 0.05 * rng.standard_normal(dim).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(v), pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, n_labels, n).astype(np.int32)),
        }
    )
    pq.write_table(tbl, f"{out_dir}/embeddings.parquet")


def generate(sf_tag: str, k: int, seed: int) -> str:
    out_dir = os.path.join(OUT_ROOT, sf_tag)
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation"):
        shutil.copy(f"{SRC}/{t}.parquet", f"{out_dir}/{t}.parquet")
    for t in OFFSETS:
        _stack(con, t, k, out_dir)
    _gen_documents(con, k, out_dir, seed)
    _gen_embeddings(con, k, out_dir, seed)
    return out_dir


#: every synthesizable scale (r7 adds sf3.0 — VERDICT r6 #3: one more
#: decade of x for the corpus-proportional lines' knee check)
SCALES = {"sf0.3": (3, 63), "sf1.0": (10, 64), "sf3.0": (30, 65)}

if __name__ == "__main__":
    import sys

    tags = sys.argv[1:] or ["sf0.3", "sf1.0"]
    for tag in tags:
        k, seed = SCALES[tag]
        d = generate(tag, k, seed)
        total = sum(
            os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
        )
        print(f"{tag}: {d} ({total/1e6:.1f} MB)")
