"""Deduplication operators for training-data pipelines.

Four tiers, all shuffle-disciplined for 100 TB:

- exact: hash-groupBy on a fingerprint — one shuffle, deterministic
  keeper (min id), never ``dropDuplicates`` on a subset (keeper there
  is partition-order-dependent).
- MinHash + LSH: shingle → minhash signature → band → bucket
  equi-join. The self-join is on (band_id, band_hash) buckets, so
  candidate generation is linear-ish in data size, NOT a crossJoin.
  Signatures are built with ``xxhash64`` over salted shingles — pure
  built-ins, no UDF, deterministic across runs/cluster sizes.
- SimHash: per-token hash sign-sums → 32-bit fingerprint; near-dups
  bucket by rotated bit-blocks (hamming-distance LSH).
- n-gram Jaccard: exact pair similarity, computed only on LSH
  candidates (array_intersect/array_union on shingle sets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geoestate_etl_spark.functions.text import fingerprint_md5, normalize_text

# --- exact ------------------------------------------------------------------


def dedup_exact(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Exact dedup by content fingerprint: one row per distinct
    normalized text, deterministic keeper = min id, with copy count."""
    return (
        df.withColumn("fp", fingerprint_md5(text_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_copies"))
    )


def dedup_by_key(df: DataFrame, keys: list[str], id_col: str) -> DataFrame:
    """Keyed dedup: deterministic keeper per key group (min id)."""
    return df.groupBy(*keys).agg(
        F.min(id_col).alias("keeper_id"), F.count("*").alias("n_copies")
    )


# --- LSH hot-bucket guard ---------------------------------------------------


def hot_buckets(banded: DataFrame, key_cols: list[str], cap: int) -> DataFrame:
    """Buckets whose occupancy exceeds ``cap`` — the audit side-output
    of :func:`cap_hot_buckets`. Columns: key_cols + ``n_members``."""
    return (
        banded.groupBy(*key_cols)
        .agg(F.count("*").alias("n_members"))
        .filter(F.col("n_members") > cap)
    )


def cap_hot_buckets(
    banded: DataFrame, key_cols: list[str], cap: int | None
) -> DataFrame:
    """Drop every row of buckets with more than ``cap`` members before
    a bucket self-join.

    An LSH bucket self-join is quadratic IN THE BUCKET: one band hash
    shared by boilerplate-heavy documents (cookie banners, licence
    headers — common at corpus scale) turns that bucket into a
    b²-pair blowup. Production near-dup pipelines skip such buckets
    entirely and log them; callers audit the drops with
    :func:`hot_buckets` (same inputs, same cap). A bucket that hot
    carries no similarity signal anyway — its members collide on
    boilerplate, not content.

    At most N/cap buckets can exceed the cap, so the anti-join's build
    side is bounded and broadcast.
    """
    if cap is None:
        return banded
    hot = hot_buckets(banded, key_cols, cap).select(*key_cols)
    return banded.join(F.broadcast(hot), key_cols, "left_anti")


# --- shingles + minhash -----------------------------------------------------


def shingles(c: Column | str, k: int = 3) -> Column:
    """k-word shingle set of the normalized text (distinct, sorted).

    Built with higher-order functions: split → sliding windows via
    transform over an index sequence → array_distinct.
    """
    col = F.col(c) if isinstance(c, str) else c
    words = F.split(normalize_text(col), " ")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, k))
    )
    return F.array_sort(F.array_distinct(sh))


def shingle_ids(c: Column | str, k: int = 3) -> Column:
    """Numeric k-shingle ids: hash each word once, combine k word
    hashes arithmetically — no per-shingle string building. Same
    set-semantics as :func:`shingles` modulo negligible hash-collision
    probability; 2-3x cheaper, and downstream set ops (minhash,
    intersect/union for Jaccard) run on longs instead of strings.

    Masks keep every intermediate within signed-64 range (ANSI mode
    throws on overflow): word hashes 31 bits, and the accumulator is
    re-masked to 57 bits after every combine step, so ``acc*31 + term``
    stays < 2^63 for ANY k (the mask is the identity for k <= 6, so
    small-k results are unchanged).
    """
    col = F.col(c) if isinstance(c, str) else c
    words = F.split(normalize_text(col), " ")
    wh = F.transform(words, lambda w: F.xxhash64(w).bitwiseAND(F.lit(0x7FFFFFFF)))
    n = F.size(wh)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    acc_mask = F.lit(0x01FFFFFFFFFFFFFF).cast(T.LongType())  # 57 bits

    def combine(i: Column) -> Column:
        acc = F.lit(0).cast(T.LongType())
        for off in range(k):
            # try_element_at: past-the-end indices (docs shorter than k
            # words) yield NULL→0 instead of ANSI INVALID_ARRAY_INDEX
            term = F.coalesce(
                F.try_element_at(wh, (i + off + 1).cast("int")), F.lit(0)
            )
            acc = (acc * 31 + term).bitwiseAND(acc_mask)
        return acc

    return F.array_distinct(F.transform(idx, combine))


def minhash_signature(shingle_col: Column | str, num_hashes: int = 16) -> Column:
    """MinHash signature: for seed j, min over shingles of
    xxhash64(j ‖ shingle). Deterministic; array<long> of length
    ``num_hashes``."""
    col = F.col(shingle_col) if isinstance(shingle_col, str) else shingle_col
    max_long = F.lit(0x7FFFFFFFFFFFFFFF).cast(T.LongType())

    # ONE fold over the shingle array: the accumulator is the running
    # per-seed minimum vector, merged with zip_with(least). Seed family
    # via the Broder two-hash trick g_j = h1 + j*h2 (64-bit wrapping) —
    # 2 string hashes per shingle instead of num_hashes salted concats.
    # masked to 62/31 bits so h1 + j*h2 can't overflow a long (ANSI mode
    # throws on wrap); entropy loss is irrelevant for min-wise hashing
    def merge(acc, s):
        h1 = F.xxhash64(s).bitwiseAND(F.lit(0x3FFFFFFFFFFFFFFF))
        h2 = F.xxhash64(s, F.lit(1)).bitwiseAND(F.lit(0x7FFFFFFF))
        salted = F.array(
            *[h1 + F.lit(j).cast(T.LongType()) * h2 for j in range(num_hashes)]
        )
        return F.zip_with(acc, salted, lambda a, c: F.least(a, c))

    return F.aggregate(col, F.array_repeat(max_long, num_hashes), merge)


def minhash_near_dups(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k_shingle: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
    max_bucket_size: int | None = 256,
) -> DataFrame:
    """Near-dup pairs via MinHash-LSH banding + exact Jaccard rescore.

    Plan shape (scale-critical): docs → (shingles, signature) once;
    explode ``bands`` band-hashes per doc; self-equi-join on
    (band, band_hash) buckets; dedupe candidate pairs; rescore with
    exact Jaccard on the shingle sets; filter by threshold.
    No crossJoin anywhere — the join key is the LSH bucket.

    ``max_bucket_size`` guards the self-join against hot buckets
    (boilerplate collisions → quadratic pair blowup): buckets above
    the cap are skipped entirely (see :func:`cap_hot_buckets`);
    audit the skips with ``hot_buckets(banded, ["band_hash"], cap)``.
    ``None`` disables the guard.
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands}); "
            "a remainder would silently drop signature rows and change the "
            "similarity threshold curve"
        )
    rows_per_band = num_hashes // bands
    # the shingle/signature projection is the CPU-heavy stage; small or
    # single-file inputs arrive as one partition, so spread it first
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    base = df.select(
        F.col(id_col).alias("id"), shingle_ids(text_col, k_shingle).alias("sh")
    ).withColumn("sig", minhash_signature("sh", num_hashes))
    # the shingle/signature stage feeds three plan branches (banding +
    # both sides of the pair rejoin); persist so the expensive
    # normalize→shingle→hash scan runs once, mirroring the
    # materialize-signatures-then-join shape a production pipeline uses.
    # Lifetime note: the cache lives until session end (default
    # MEMORY_AND_DISK — Spark evicts/spills under pressure); a caller
    # that owns the session can df.unpersist() the returned plan's
    # cached ancestor, and a production pipeline writes signatures to a
    # table instead of caching.
    base = base.persist()

    band_arr = F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    ",",
                    F.lit(b),
                    *[
                        F.col("sig").getItem(b * rows_per_band + r)
                        for r in range(rows_per_band)
                    ],
                )
            )
            for b in range(bands)
        ]
    )
    # band the ids WITHOUT the shingle arrays: the exploded (4x) rows and
    # the self-join shuffle then move only (id, band_hash) pairs — wide
    # array payloads rejoin once per side, keyed by id, after dedupe
    banded = base.withColumn("band_hash", F.explode(band_arr)).select(
        "id", "band_hash"
    )
    banded = cap_hot_buckets(banded, ["band_hash"], max_bucket_size)
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )

    sets = base.select("id", "sh")
    cands = pairs.join(
        sets.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a"
    ).join(sets.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")

    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        cands.withColumn(
            "jaccard", F.round(inter / F.greatest(union, F.lit(1)), 4)
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --- simhash ----------------------------------------------------------------


def simhash32(c: Column | str) -> Column:
    """32-bit SimHash of the whitespace tokens.

    bit b = sign of Σ_tokens (2·((xxhash64(tok)>>b)&1) − 1). Pure
    higher-order aggregation — per-bit sums fold over the token array.
    """
    col = F.col(c) if isinstance(c, str) else c
    toks = F.split(normalize_text(col), " ")
    h = F.transform(toks, lambda t: F.xxhash64(t))

    zero = F.lit(0).cast(T.LongType())

    # ONE fold over the token hashes: accumulator = vector of 32 signed
    # bit-sums, each token contributes ±1 per bit (literal-unrolled
    # shifts keep everything JVM-side; a fold-per-bit re-walks the
    # tokens 32 times).
    def merge(acc, x):
        contrib = F.array(
            *[
                (F.shiftright(x, b).bitwiseAND(F.lit(1)) * 2 - 1).cast(T.LongType())
                for b in range(32)
            ]
        )
        return F.zip_with(acc, contrib, lambda a, v: a + v)

    # pack in the aggregate's finish fn: `acc` is a bound variable there,
    # so the fold runs once no matter how many bits reference it
    def pack(acc):
        out = zero
        for b in range(32):
            out = out + F.when(
                acc.getItem(b) > 0, F.lit(1 << b).cast(T.LongType())
            ).otherwise(zero)
        return out

    return F.aggregate(h, F.array_repeat(zero, 32), merge, pack)


def simhash_near_dups(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    max_bucket_size: int | None = 1024,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ ``max_hamming``.

    LSH on 4 byte-blocks of the 32-bit hash; by pigeonhole, distance
    ≤ 3 guarantees at least one identical 8-bit block, so candidate
    recall is exact. Candidates equi-join on (block_id, block_value),
    then exact popcount rescore — never an all-pairs comparison.

    ``max_bucket_size`` caps block-bucket occupancy like the MinHash
    path (see :func:`cap_hot_buckets`); the exact-recall pigeonhole
    guarantee holds for every pair whose shared blocks all stay under
    the cap. Default is looser than MinHash's because an 8-bit block
    has only 256 values — benign buckets run bigger.
    """
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    base = df.select(F.col(id_col).alias("id"), simhash32(text_col).alias("sh"))
    blocks = F.array(
        *[
            F.concat_ws(
                ":", F.lit(i), F.shiftright("sh", i * 8).bitwiseAND(F.lit(0xFF))
            )
            for i in range(4)
        ]
    )
    banded = base.withColumn("blk", F.explode(blocks))
    banded = cap_hot_buckets(banded, ["blk"], max_bucket_size)
    left, right = banded.alias("l"), banded.alias("r")
    cands = (
        left.join(
            right,
            (F.col("l.blk") == F.col("r.blk")) & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sh").alias("sh_a"),
            F.col("r.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cands.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
