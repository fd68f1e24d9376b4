"""Custom Spark DataSource: deterministic synthetic document
generator (``format("docgen")``).

The reference ships service connectors (Kafka/Hive/JDBC) that need
live services; the engine-side skill they demonstrate — implementing
a *source*: schema, partition planning, per-partition reads — is
exercised here through Spark 4's Python DataSource API with a
connector that runs anywhere: a seeded corpus generator in the mold
of Spark's built-in ``rate`` source, but for document rows.

Why it matters at scale: generating benchmark corpora as a SOURCE
(instead of materializing parquet first) removes the storage step
entirely — ``spark.read.format("docgen").option("n_docs", 10**9)``
plans one InputPartition per shard and every executor synthesizes
its slice locally; 100 TB of test input costs zero bytes at rest.
Determinism: each row derives from ``md5(seed|doc_id)``, so any
partitioning, any cluster, any rerun yields the byte-identical
corpus (the same property the testdata generator guarantees).

Registration: ``spark.dataSource.register(DocGenDataSource)`` then
``spark.read.format("docgen").option(...).load()`` — see
tests/test_sources.py.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_WORDS = (
    "the of and to a in for is on that by this with from at as but "
    "be are was were has have had not no yes all any each new old "
    "data model train token corpus sample filter score merge shard"
).split()

SCHEMA_DDL = "doc_id bigint, text string, lang string, source string"


def _row(seed: str, doc_id: int) -> tuple[int, str, str, str]:
    h = hashlib.md5(f"{seed}|{doc_id}".encode()).digest()
    n_tokens = 10 + h[0] % 40
    words = []
    for i in range(n_tokens):
        hb = hashlib.md5(f"{seed}|{doc_id}|{i}".encode()).digest()
        words.append(_WORDS[hb[0] % len(_WORDS)])
    lang = ("en", "de", "es", "fr")[h[1] % 4]
    source = f"src{h[2] % 8}"
    return doc_id, " ".join(words), lang, source


class _Shard(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class DocGenReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_shards = int(options.get("n_shards", 8))
        self.seed = options.get("seed", "docgen")
        self.lo = 0              # inclusive, narrowed by pushFilters
        self.hi = self.n_docs    # exclusive

    def pushFilters(self, filters):
        """Source-side pushdown (SURVEY §2.1 pushdown traits): range
        predicates on ``doc_id`` narrow the generated id range BEFORE
        partition planning, so filtered scans synthesize only the
        surviving slice (fewer shards, less work — the custom-source
        analog of parquet's PushedFilters). Handled filters are fully
        absorbed; everything else is returned for Spark to evaluate.
        """
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            attr = getattr(f, "attribute", None)
            if attr != ("doc_id",):
                yield f
                continue
            if isinstance(f, LessThan):
                self.hi = min(self.hi, int(f.value))
            elif isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, int(f.value) + 1)
            elif isinstance(f, GreaterThan):
                self.lo = max(self.lo, int(f.value) + 1)
            elif isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, int(f.value))
            elif isinstance(f, EqualTo):
                self.lo = max(self.lo, int(f.value))
                self.hi = min(self.hi, int(f.value) + 1)
            else:
                yield f

    def partitions(self) -> list[InputPartition]:
        lo, hi = self.lo, max(self.lo, self.hi)
        n = hi - lo
        if n == 0:
            return [_Shard(0, 0)]
        shards = min(self.n_shards, n)
        per = -(-n // shards)  # ceil
        return [
            _Shard(lo + i * per, min(lo + (i + 1) * per, hi))
            for i in range(shards)
            if lo + i * per < hi
        ]

    def read(self, partition: _Shard) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield _row(self.seed, doc_id)


class DocGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "docgen"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DocGenReader:
        return DocGenReader(self.options)

    def streamReader(self, schema: StructType) -> "DocGenStreamReader":
        return DocGenStreamReader(self.options)


class DocGenStreamReader(DataSourceStreamReader):
    """Offset-based replayable STREAMING source — the engine-side
    contract of the reference's Kafka connector
    (`flink-connectors/flink-connector-kafka-base`:
    FlinkKafkaConsumerBase's checkpointed partition offsets): the
    stream's progress is a monotone offset dict; each micro-batch is
    the half-open offset range [start, end); ``partitions`` splits
    that range into executor tasks; and REPLAYING a range after a
    failure yields byte-identical rows (determinism does here what
    Kafka's log does there), so checkpoint recovery is exactly-once
    with no sink-side dedup.

    ``commit(end)`` is the offset-commit callback (Kafka's
    commitAsync analog) — progress below ``end`` may be reclaimed.

    **Monotonicity across restarts.** ``latestOffset`` must never
    move backward past the checkpointed offset, or the engine
    re-plans already-delivered ranges (measured: a fresh reader whose
    tip restarted at 0 made a clean-restart re-emit two quanta). A
    real source gets this for free from its external system — the
    Kafka broker's log tip IS monotone state. The generator's
    stand-in is ``progress_path``: ``commit`` persists the
    high-water mark there and a restarted reader resumes from it
    (plus in-memory clamping from every ``partitions`` range it is
    asked to replay). A single run is exact without the option, but
    RESTART REQUIRES IT: one backward ``latestOffset`` return is
    enough to rewind the engine's write-ahead offset log, after
    which re-emission is the engine's own (correct) behavior — the
    same duplication Kafka shows when committed offsets are lost and
    ``auto.offset.reset`` rewinds. Restart-correctness is
    pytest-gated with the option set.

    Options: ``docs_per_batch`` rows admitted per trigger (default
    100), ``n_docs`` total cap (stream idles at the cap),
    ``n_shards`` tasks per batch, ``seed``, ``progress_path``.
    """

    def __init__(self, options: dict):
        self.docs_per_batch = int(options.get("docs_per_batch", 100))
        self.n_docs = int(options.get("n_docs", 10**6))
        self.n_shards = int(options.get("n_shards", 4))
        self.seed = options.get("seed", "docgen")
        self.progress_path = options.get("progress_path")
        self.committed = -1  # test-visible commit high-water mark
        self._tip = 0
        if self.progress_path:
            import os

            if os.path.isfile(self.progress_path):
                with open(self.progress_path) as f:
                    self._tip = int(f.read().strip())

    def initialOffset(self) -> dict:
        return {"doc_id": 0}

    def latestOffset(self) -> dict:
        # advance one batch quantum per trigger, capped at the corpus
        # end — the available-data probe a real source answers from
        # its log tip
        nxt = min(self._tip + self.docs_per_batch, self.n_docs)
        self._tip = nxt
        return {"doc_id": nxt}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["doc_id"]), int(end["doc_id"])
        # any range the engine asks for is proven progress — clamp the
        # tip so a restarted reader can never fall behind it
        self._tip = max(self._tip, lo, hi)
        n = hi - lo
        if n <= 0:
            return [_Shard(lo, lo)]
        shards = min(self.n_shards, n)
        per = -(-n // shards)
        return [
            _Shard(lo + i * per, min(lo + (i + 1) * per, hi))
            for i in range(shards)
            if lo + i * per < hi
        ]

    def read(self, partition: _Shard) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield _row(self.seed, doc_id)

    def commit(self, end: dict) -> None:
        self.committed = int(end["doc_id"])
        self._tip = max(self._tip, self.committed)
        if self.progress_path:
            import os

            # atomic replace: a crash mid-write must never leave an
            # empty/partial mark — a partial value below the
            # checkpointed offset would rewind latestOffset, the
            # exact duplication this file exists to prevent (reads
            # stay strict int(): an unreadable mark fails LOUD)
            tmp = self.progress_path + ".tmp"
            with open(tmp, "w") as f:
                f.write(f"{self.committed}\n")
            os.replace(tmp, self.progress_path)
