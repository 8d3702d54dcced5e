"""Synthesize the SKEW stress tier (r8 — VERDICT r7 #3).

Every scale-sweep corpus so far is uniform-synthetic; real crawl data
is Zipfian. This generator writes ``data/skew/`` (gitignored —
regenerate with ``python tools/gen_skew.py``) at sf1-equivalent
volume (50k docs / 20k vectors) with three planted skew mechanisms,
each matched to the operator guard it is meant to stress:

- **Hot LSH band**: the first ``HOT_DOCS`` documents share one long
  boilerplate block (their shingle sets are ~boilerplate plus two
  unique tail words), so their MinHash signatures nearly coincide and
  they collide into the same bucket in most bands. Uncapped, the
  bucket self-join generates ~C(HOT_DOCS, 2) candidate pairs per band
  — the quadratic blowup ``cap_hot_buckets`` exists to stop.
- **Hot SemDeDup cluster**: ``HOT_VECS`` embeddings sit in a tight
  ball around one centroid, so one IVF cell holds a quarter of the
  corpus — the blowup ``max_cluster_size`` exists to stop.
- **Zipf domains**: the ``source``/``lang`` columns follow a Zipf
  (s≈1.5) law, so one domain dominates — the shape the budgeted
  mixture sampler's per-(domain, bucket) cumsum must parallelize
  through instead of serializing into one window task.

Celebrity-key join skew needs no file: the stress tool and test build
the fact/dim frames from ``spark.range`` (a hot key holding half the
fact rows) and exercise ``hot_keys`` / ``adaptive_skew_join`` on them.

Deterministic (fixed seed) so repeated runs produce identical bytes.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "skew"
)

N_DOCS = 50_000
HOT_DOCS = 4_000
N_VECS = 20_000
HOT_VECS = 5_000
DIM = 64
SEED = 81

#: Zipf weights over 10 source domains / 6 languages (s = 1.5)
_DOMAINS = [f"src{i}" for i in range(10)]
_LANGS = ["en", "de", "fr", "es", "zh", "ru"]


def _zipf_probs(n: int, s: float = 1.5) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** s
    return w / w.sum()


def _vocab() -> list[str]:
    return [f"w{i:03d}" for i in range(200)]


def gen_documents(out_dir: str, seed: int = SEED) -> None:
    rng = np.random.default_rng(seed)
    vocab = _vocab()
    boiler = " ".join(vocab[i % len(vocab)] for i in range(7, 367, 6))  # 60 words
    lens = rng.integers(8, 110, N_DOCS)
    src = rng.choice(_DOMAINS, N_DOCS, p=_zipf_probs(len(_DOMAINS)))
    lang = rng.choice(_LANGS, N_DOCS, p=_zipf_probs(len(_LANGS)))
    texts: list[str] = []
    for i in range(N_DOCS):
        if i < HOT_DOCS:
            # boilerplate-dominated: ~60 shared words + 2 unique ones
            texts.append(f"{boiler} uniq{i:05d} tail{i:05d}")
        else:
            idx = rng.integers(0, len(vocab), int(lens[i]))
            texts.append(" ".join(vocab[j] for j in idx))
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(N_DOCS), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(lang.tolist()),
            "source": pa.array(src.tolist()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{out_dir}/documents.parquet")


def gen_embeddings(out_dir: str, seed: int = SEED) -> None:
    rng = np.random.default_rng(seed + 1)
    v = rng.standard_normal((N_VECS, DIM)).astype(np.float32)
    centroid = rng.standard_normal(DIM).astype(np.float32) * 3.0
    v[:HOT_VECS] = centroid[None, :] + 0.01 * rng.standard_normal(
        (HOT_VECS, DIM)
    ).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(N_VECS), pa.int64()),
            "embedding": pa.array(list(v), pa.list_(pa.float32())),
            "label": pa.array(
                rng.integers(0, 8, N_VECS).astype(np.int32)
            ),
        }
    )
    pq.write_table(tbl, f"{out_dir}/embeddings.parquet")


def generate() -> str:
    os.makedirs(OUT_DIR, exist_ok=True)
    gen_documents(OUT_DIR)
    gen_embeddings(OUT_DIR)
    return OUT_DIR


if __name__ == "__main__":
    d = generate()
    total = sum(os.path.getsize(os.path.join(d, f)) for f in os.listdir(d))
    print(f"skew tier: {d} ({total / 1e6:.1f} MB)")
