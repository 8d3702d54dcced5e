"""CCNet/RefinedWeb-style sub-document (line/paragraph) dedup:
first-occurrence-wins across the corpus, structural blanks preserved,
deterministic under repartitioning, and DuckDB-parity on the whole
rebuild (the repo-local oracle discipline for ops outside the
50-entry registry)."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoestate_etl_spark.operators.dedup import dedup_spans


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_removes_later_duplicate_lines_keeps_first(spark):
    rows = [
        (1, "alpha one\ncookie banner text\nbody of doc one"),
        (2, "cookie banner text\nbody of doc two"),
        (3, "body of doc three\ncookie banner text"),
    ]
    got = {
        r.doc_id: (r.text, r.n_spans_dropped)
        for r in dedup_spans(_df(spark, rows)).collect()
    }
    assert got[1] == ("alpha one\ncookie banner text\nbody of doc one", 0)
    assert got[2] == ("body of doc two", 1)
    assert got[3] == ("body of doc three", 1)


def test_blank_and_short_spans_are_structure(spark):
    rows = [
        (1, "real paragraph here\n\nanother real paragraph"),
        (2, "real paragraph here\n\nsecond doc tail"),
    ]
    got = {
        r.doc_id: r.text
        for r in dedup_spans(_df(spark, rows), min_chars=2).collect()
    }
    # the blank middle span survives in BOTH docs (never deduped)
    assert got[1] == "real paragraph here\n\nanother real paragraph"
    assert got[2] == "\nsecond doc tail"


def test_fully_duplicated_doc_empties_out(spark):
    rows = [(1, "only line"), (2, "only line")]
    got = {
        r.doc_id: (r.text, r.n_spans_dropped)
        for r in dedup_spans(_df(spark, rows)).collect()
    }
    assert got == {1: ("only line", 0), 2: ("", 1)}


def test_within_doc_repeats_also_collapse(spark):
    rows = [(7, "chorus line\nverse one\nchorus line\nverse two")]
    [r] = dedup_spans(_df(spark, rows)).collect()
    assert r.text == "chorus line\nverse one\nverse two"
    assert r.n_spans_dropped == 1


def test_paragraph_delimiter_and_null_text(spark):
    rows = [
        (1, "para A\n\npara B"),
        (2, "para B\n\npara C"),
        (3, None),
    ]
    got = {
        r.doc_id: r.text
        for r in dedup_spans(_df(spark, rows), delimiter="\n\n").collect()
    }
    assert got == {1: "para A\n\npara B", 2: "para C", 3: ""}


def test_deterministic_across_partitionings(spark):
    rows = [
        (i, f"shared header\nunique body {i}\nshared footer") for i in range(200)
    ]
    a = dedup_spans(_df(spark, rows)).collect()
    b = dedup_spans(_df(spark, rows).repartition(13)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    keep_all = [t for _, t, _ in sorted(map(tuple, a))][0]
    assert keep_all == "shared header\nunique body 0\nshared footer"
    # every later doc lost exactly the two shared spans
    assert all(
        t == f"unique body {i}" for i, t, _ in map(tuple, a) if i > 0
    )


def test_run_corpus_span_stage(spark):
    """First-class pipeline stage: span dedup runs before
    fingerprinting, its funnel count is exact, and a doc reduced to
    pure boilerplate is dropped rather than packed as empty tape."""
    from geoestate_etl_spark.plans.corpus_pipeline import run_corpus

    body = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, f"shared cookie banner line is long\n{body} one"),
        (2, f"shared cookie banner line is long\n{body} two"),
        (3, "shared cookie banner line is long"),  # boilerplate-only
        # boilerplate + blank structure only: rebuilds to "\n\n", which
        # is whitespace, not content — must drop like doc 3 does
        (4, "shared cookie banner line is long\n\n\nshared cookie banner line is long"),
    ]
    res = run_corpus(
        _df(spark, rows),
        gate=F.lit(True),
        span_dedup_delimiter="\n",
    )
    try:
        texts = {
            r.doc_id: r.text for r in res.cached.select("doc_id", "text").collect()
        }
        assert set(texts) == {1, 2}
        assert texts[1].startswith("shared cookie banner")
        assert "banner" not in texts[2]
        # doc2 lost the banner line; doc3 lost its only span; doc4
        # lost both banner occurrences
        assert res.n_spans_dropped == 4
        assert res.n_gated == 4 and res.n_exact_unique == 2
    finally:
        res.unpersist()


def test_duckdb_parity_full_rebuild(spark, duck):
    """The whole operator (split → first-occurrence winners → rebuild)
    re-expressed in SQL over the same literal corpus must match
    row-for-row — machinery certified even though the registry's
    documents table has no line structure to exercise it on."""
    rows = [
        (1, "alpha\nshared boiler\nbeta"),
        (2, "shared boiler\ngamma\n\nalpha"),
        (3, "delta\nalpha\nshared boiler"),
        (4, ""),
    ]
    out = dedup_spans(_df(spark, rows)).select(
        "doc_id", "text", "n_spans_dropped"
    )
    vals = ", ".join(
        "(%d, '%s')" % (i, t.replace("'", "''")) if t is not None else f"({i}, NULL)"
        for i, t in rows
    )
    sql = f"""
WITH docs(doc_id, text) AS (VALUES {vals}),
spans AS (
  SELECT doc_id, i - 1 AS pos, s[i] AS span,
         length(regexp_replace(s[i], '^\\s+|\\s+$', '', 'g')) >= 1 AS elig
  FROM (SELECT doc_id, string_split(COALESCE(text, ''), chr(10)) AS s FROM docs),
       UNNEST(range(1, len(s) + 1)) AS r(i)
),
winners AS (
  SELECT span, min(struct_pack(doc_id := doc_id, pos := pos)) AS w
  FROM spans WHERE elig GROUP BY span
),
kept AS (
  SELECT sp.doc_id, sp.pos, sp.span,
         (NOT sp.elig) OR (w.w.doc_id = sp.doc_id AND w.w.pos = sp.pos) AS keep
  FROM spans sp LEFT JOIN winners w USING (span)
)
SELECT doc_id,
       COALESCE(string_agg(CASE WHEN keep THEN span END, chr(10) ORDER BY pos), '')
         AS text,
       CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_spans_dropped
FROM kept GROUP BY doc_id
"""
    import sys

    sys.path.insert(0, "tests")
    from oracle_utils import compare_spark_duckdb

    ok, msg = compare_spark_duckdb(out, duck, sql)
    assert ok, msg


# --- hypothesis property tier ------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_SPAN = st.sampled_from(
    ["shared boiler", "alpha", "beta beta", "", " ", "\t", "x", "unique tail"]
)
_TEXT = st.lists(_SPAN, min_size=0, max_size=6).map("\n".join)


def _py_dedup_spans(rows, delim="\n", min_chars=1):
    """Pure-Python reference: global first-occurrence (min id, pos)
    wins; short/blank spans always kept."""
    seen = set()
    out = {}
    for i, t in sorted(rows, key=lambda x: x[0]):
        kept, dropped = [], 0
        for s in (t or "").split(delim):
            if len(s.strip()) >= min_chars:
                if s in seen:
                    dropped += 1
                    continue
                seen.add(s)
            kept.append(s)
        out[i] = (delim.join(kept), dropped)
    return out


@settings(max_examples=5, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=8))
def test_span_dedup_matches_python_reference(spark, texts):
    rows = list(enumerate(texts))
    got = {
        r.doc_id: (r.text, r.n_spans_dropped)
        for r in dedup_spans(_df(spark, rows)).collect()
    }
    assert got == _py_dedup_spans(rows)


def test_incremental_fold_invariance(spark):
    """Per-epoch span dedup against a standing seen-spans table folds
    to EXACTLY the corpus-wide operator: batches in id order, history
    unioned between epochs, concatenated output == full rerun."""
    from geoestate_etl_spark.operators.dedup import dedup_spans_incremental

    rows = [
        (1, "boiler\nalpha\nboiler"),
        (2, "beta\nboiler"),
        (3, "alpha\ngamma"),
        (4, "gamma\nboiler\ndelta"),
        (5, ""),
        (6, "delta\nepsilon\n\nbeta"),
    ]
    full = {
        r.doc_id: (r.text, r.n_spans_dropped)
        for r in dedup_spans(_df(spark, rows)).collect()
    }

    got = {}
    seen = None
    for batch_rows in (rows[:2], rows[2:4], rows[4:]):
        out, new_fps = dedup_spans_incremental(_df(spark, batch_rows), seen)
        for r in out.collect():
            got[r.doc_id] = (r.text, r.n_spans_dropped)
        seen = new_fps if seen is None else seen.unionByName(new_fps)
        # standing table stays queryable frame-to-frame (no persist
        # needed for the test; production materializes per epoch)
    assert got == full
