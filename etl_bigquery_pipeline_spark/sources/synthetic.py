"""Custom Python DataSource (Spark 4 extension point): deterministic
synthetic document corpus.

Demonstrates the `pyspark.sql.datasource` API — the way this engine grows
new sources without JVM code. The source generates a seeded, partitioned
document corpus (for load tests and dedup benchmarking) entirely on
executors: N partitions each derive their rows from (seed, partition_id,
row_id) md5 draws, so the corpus is reproducible at any parallelism and no
data ever flows from the driver.

Usage:
    spark.dataSource.register(SyntheticDocsDataSource)
    df = (spark.read.format("synthetic_docs")
          .option("rows", 10000).option("partitions", 8)
          .option("seed", 42).load())
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

_WORDS = (
    "the data spark table join filter window merge sort batch stream key "
    "query row column value hash group order part line customer vector"
).split()

SCHEMA_DDL = "doc_id bigint, text string, lang string, n_tokens int"
_LANGS = ("en", "es", "de", "fr", "zh")


def _rand_ints(seed: int, pid: int, row: int, n: int) -> list[int]:
    """n deterministic pseudo-random ints from md5(seed:pid:row:block)."""
    out: list[int] = []
    block = 0
    while len(out) < n:
        h = hashlib.md5(f"{seed}:{pid}:{row}:{block}".encode()).digest()
        out.extend(h[i] for i in range(16))
        block += 1
    return out[:n]


class _Partition(InputPartition):
    def __init__(self, pid: int, start: int, end: int):
        self.pid = pid
        self.start = start
        self.end = end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        per = (self.rows + self.n_parts - 1) // self.n_parts
        return [
            _Partition(i, i * per, min((i + 1) * per, self.rows))
            for i in range(self.n_parts)
            if i * per < self.rows
        ]

    def read(self, partition: _Partition):
        for doc_id in range(partition.start, partition.end):
            draws = _rand_ints(self.seed, partition.pid, doc_id, 42)
            n_tokens = 10 + draws[0] % 30
            words = [_WORDS[d % len(_WORDS)] for d in draws[1 : 1 + n_tokens]]
            lang = _LANGS[draws[41] % len(_LANGS)]
            yield (doc_id, " ".join(words), lang, n_tokens)


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticDocsReader(self.options)


# ---------------------------------------------------------------------------
# Streaming Python DataSource: the same deterministic generator exposed
# through the micro-batch offset lifecycle (Spark 4
# SimpleDataSourceStreamReader — the engine passes the START offset to
# every read, so the reader is STATELESS and checkpoint restart works by
# construction; the partition-based DataSourceStreamReader variant keeps
# offset state inside the reader instance, which a restart would reset).
# Offsets are {"row": N} counters; each read releases one batch of
# ``batch_rows`` until ``total_rows``. Rows derive from (seed, row_id)
# only, never the wall clock: replaying any offset range is
# bit-identical (exactly-once downstream becomes testable). Reads run
# driver-side per the Simple API — right for control-plane-sized
# batches; a high-volume source would use the partitioned API plus an
# external offset ledger.

EVENTS_SCHEMA_DDL = "event_id bigint, user_id bigint, event_type string, value double"
_EVENT_TYPES = ("view", "click", "purchase")


def _event_row(seed: int, rid: int):
    draws = _rand_ints(seed, 0, rid, 4)
    return (
        rid,
        draws[0] % 50,
        _EVENT_TYPES[draws[1] % len(_EVENT_TYPES)],
        float(draws[2]),
    )


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.batch_rows = int(options.get("batch_rows", 100))
        self.total_rows = int(options.get("total_rows", 1000))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self):
        return {"row": 0}

    def read(self, start):
        lo = start["row"]
        hi = min(lo + self.batch_rows, self.total_rows)
        rows = [_event_row(self.seed, rid) for rid in range(lo, hi)]
        return iter(rows), {"row": hi}

    def readBetweenOffsets(self, start, end):
        # replay for recovery: pure function of the offset range
        return iter(
            [_event_row(self.seed, rid) for rid in range(start["row"], end["row"])]
        )

    def commit(self, end):
        pass  # offsets live in the checkpoint; nothing external to ack


class SyntheticEventsStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events_stream"

    def schema(self) -> str:
        return EVENTS_SCHEMA_DDL

    def simpleStreamReader(self, schema: StructType):
        return SyntheticEventsStreamReader(self.options)
