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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
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
