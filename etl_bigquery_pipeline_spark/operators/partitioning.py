"""Partition-width helpers for expensive narrow projections.

The problem: small parquet inputs arrive as ONE file split, so an
expensive per-row projection placed directly on the scan (shingling, md5
signature packs, hyperplane bucket codes, per-pair dot products) runs in
a single task regardless of cluster size. The round-1 fix was an
unconditional ``df.repartition(defaultParallelism, key)`` before the
projection — fast at sf0.1, but at 100 TB the input already arrives in
~800k splits and that repartition becomes a corpus-wide shuffle of the
document BODY added for nothing, violating the "the body never shuffles"
invariant (SCALE.md).

``widen_if_narrow`` keeps both regimes correct: it repartitions only when
the actual scan width is below the session's parallelism, so the small
local input gets spread across executors while the at-scale plan keeps
zero body shuffles. The check reads the compiled physical partitioning
(``df.rdd.getNumPartitions()``) — for a parquet scan that is the file
split count, which is exactly the signal we want; no job runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def widen_if_narrow(
    df: DataFrame,
    *key_cols: str | Column,
    min_partitions: int | None = None,
) -> DataFrame:
    """Repartition ``df`` to ``min_partitions`` (default: the session's
    ``defaultParallelism``) hash-partitioned on ``key_cols`` — but ONLY
    when the input is narrower than that. Returns ``df`` unchanged (no
    added Exchange) when it is already at least that wide.

    Use this, not a bare ``repartition``, in front of every expensive
    text/vector projection: the explicit partition count stops AQE from
    coalescing the compute stage on tiny inputs, while wide at-scale
    inputs pass through shuffle-free.
    """
    par = (
        min_partitions
        if min_partitions is not None
        else df.sparkSession.sparkContext.defaultParallelism
    )
    if df.rdd.getNumPartitions() >= par:
        return df
    if key_cols:
        cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
        return df.repartition(par, *cols)
    return df.repartition(par)
