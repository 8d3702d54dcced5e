"""Custom Python DataSources (Spark 4 `pyspark.sql.datasource` API):
the engine's native extension surface for sources Spark has no
built-in reader for.

Two sources, both registered by :func:`register_python_sources`:

``corpusgen`` — a deterministic synthetic-document READ source (batch
AND streaming) used the way production pipelines use a firehose tap:

- **partition-parallel**: `partitions()` splits the id range into
  contiguous `InputPartition`s; every row is generated executor-side
  from (seed, doc_id) alone, so content is independent of the
  partitioning — the repo-wide determinism rule;
- **real filter pushdown** (`pushFilters`, Spark 4.1): doc_id range
  predicates narrow the generated id interval and lang equality/IN
  prunes whole rows at the generator, EXACTLY (lang is a pure
  function of doc_id) — supported filters are consumed, everything
  else is returned to Spark to apply on top. At 100 TB-equivalent
  rates this is the difference between generating a trillion rows
  and generating the requested slice;
- **streaming**: the full partition-planned `DataSourceStreamReader`
  (executor-side reads — NOT the driver-side Simple variant), with
  offsets as plain id watermarks: replayable, deterministic batches
  for exactly-once downstream tests.

``jsonlsink`` — a WRITE source demonstrating the commit protocol:
tasks write `part-<id>.jsonl` files and return them as
`WriterCommitMessage`s; `commit()` publishes a `_MANIFEST` naming
exactly the committed files (readers that honor the manifest never
see output from failed/speculative tasks — the classic job-commit
contract, same idea as the shard writer's checksummed manifest in
`sources/shards.py`).

Reference parity: none — the reference reads CSV with pandas
(`dags/main.py`); this is engine-declared extension surface showing
the idiomatic Spark-4 path for custom connectors (SURVEY §2 S-tier
extensions).
"""

from __future__ import annotations

import json
import os
import zlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

__all__ = [
    "CorpusGenDataSource",
    "JsonlSinkDataSource",
    "register_python_sources",
    "gen_row",
]

LANGS = ("en", "de", "fr", "ru", "zh")
_WORDS = (
    "property housing market region price square listing agent city "
    "street year built floor wall material brick panel wood value "
    "the a of in and for with near this that was is on by from"
).split()


def _lang_of(doc_id: int) -> str:
    return LANGS[doc_id % len(LANGS)]


def gen_row(doc_id: int, seed: int) -> tuple:
    """The one definition of a generated row — shared by the batch
    reader, the stream reader, and tests. Deterministic from
    (seed, doc_id) only: zlib.crc32 (stable across processes, unlike
    Python's salted ``hash``) drives word choice and length. The word
    pool mixes content terms with stopwords and each doc ends in a
    period so generated docs pass realistic quality gates (length,
    stopword ratio, punctuation) the way real corpus text does."""
    h = zlib.crc32(f"{seed}:{doc_id}".encode())
    n_words = 30 + h % 40
    words = [
        _WORDS[zlib.crc32(f"{seed}:{doc_id}:{i}".encode()) % len(_WORDS)]
        for i in range(n_words)
    ]
    return (
        doc_id,
        _lang_of(doc_id),
        f"gen-{h % 4}",
        " ".join(words) + ".",
    )


class _IdRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class CorpusGenReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.seed = int(options.get("seed", 42))
        self.lo, self.hi = 0, self.n_rows  # [lo, hi) id interval
        self.langs: set[str] | None = None  # None = all

    def pushFilters(self, filters: list[Filter]):
        """Consume doc_id range predicates (narrow [lo, hi)) and lang
        equality/IN (prune at the generator — exact, since lang is a
        pure function of doc_id); yield everything else back to Spark.
        """
        for f in filters:
            if isinstance(f, (GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, EqualTo)) and f.attribute == ("doc_id",) and isinstance(f.value, int):
                v = f.value
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, v + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, v)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, v)
                elif isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, v + 1)
                else:  # EqualTo
                    self.lo, self.hi = max(self.lo, v), min(self.hi, v + 1)
            elif isinstance(f, EqualTo) and f.attribute == ("lang",) and isinstance(f.value, str):
                want = {f.value}
                self.langs = want if self.langs is None else self.langs & want
            elif isinstance(f, In) and f.attribute == ("lang",):
                want = {v for v in f.values if isinstance(v, str)}
                self.langs = want if self.langs is None else self.langs & want
            else:
                yield f  # unsupported — Spark applies it post-scan

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        n = max(1, self.n_partitions)
        span = max(1, (hi - lo + n - 1) // n) if hi > lo else 1
        return [
            _IdRange(s, min(s + span, hi)) for s in range(lo, hi, span)
        ] or [_IdRange(lo, lo)]

    def read(self, partition: _IdRange):
        langs = self.langs
        for doc_id in range(partition.start, partition.end):
            if langs is not None and _lang_of(doc_id) not in langs:
                continue
            yield gen_row(doc_id, self.seed)


class CorpusGenStreamReader(DataSourceStreamReader):
    """Partition-planned micro-batches over the same generator: the
    offset is a plain id watermark, so any (start, end) batch replays
    to identical rows — the property downstream exactly-once tests
    lean on."""

    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.n_partitions = int(options.get("n_partitions", 4))
        self.max_rows = int(options.get("max_rows", 10_000))
        self.seed = int(options.get("seed", 42))
        self._latest = 0

    def initialOffset(self) -> dict:
        return {"id": 0}

    def latestOffset(self) -> dict:
        self._latest = min(self._latest + self.rows_per_batch, self.max_rows)
        return {"id": self._latest}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["id"]), int(end["id"])
        n = max(1, self.n_partitions)
        span = max(1, (hi - lo + n - 1) // n) if hi > lo else 1
        return [
            _IdRange(s, min(s + span, hi)) for s in range(lo, hi, span)
        ] or [_IdRange(lo, lo)]

    def read(self, partition: _IdRange):
        for doc_id in range(partition.start, partition.end):
            yield gen_row(doc_id, self.seed)

    def commit(self, end: dict) -> None:
        pass  # offsets are self-describing; nothing external to ack


class CorpusGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "corpusgen"

    def schema(self) -> str:
        return "doc_id bigint, lang string, source string, text string"

    def reader(self, schema: StructType) -> CorpusGenReader:
        return CorpusGenReader(dict(self.options))

    def streamReader(self, schema: StructType) -> CorpusGenStreamReader:
        return CorpusGenStreamReader(dict(self.options))


class _Committed(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename, self.n_rows = filename, n_rows


class JsonlSinkWriter(DataSourceWriter):
    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        self.path = options["path"]
        self.cols = [f.name for f in schema.fields]
        self.overwrite = overwrite

    def write(self, rows) -> _Committed:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        part = ctx.partitionId() if ctx is not None else 0
        # the attempt id keeps retried/speculative tasks from writing
        # the same file; only the committed attempt reaches _MANIFEST
        att = ctx.taskAttemptId() if ctx is not None else 0
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{part:05d}-{att}.jsonl"
        n = 0
        with open(os.path.join(self.path, name), "w") as fh:
            for row in rows:
                fh.write(json.dumps(dict(zip(self.cols, row)), default=str))
                fh.write("\n")
                n += 1
        return _Committed(name, n)

    def commit(self, messages) -> None:
        """Publish the manifest LAST: a reader honoring _MANIFEST can
        never observe a partially-committed job (files from failed or
        speculative tasks are simply never listed)."""
        manifest = {
            "files": sorted(m.filename for m in messages if m is not None),
            "n_rows": sum(m.n_rows for m in messages if m is not None),
        }
        with open(os.path.join(self.path, "_MANIFEST"), "w") as fh:
            json.dump(manifest, fh)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass


class JsonlSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonlsink"

    def writer(self, schema: StructType, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(dict(self.options), schema, overwrite)


def register_python_sources(spark) -> None:
    """Idempotent registration of both sources on a session. Also
    enables Python-source filter pushdown (off by default in 4.1;
    runtime-settable) — without it Spark refuses any reader that
    implements pushFilters."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(CorpusGenDataSource)
    spark.dataSource.register(JsonlSinkDataSource)
