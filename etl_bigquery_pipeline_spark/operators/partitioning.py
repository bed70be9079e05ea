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
zero body shuffles.

Width is probed WITHOUT touching ``df.rdd``: under AQE, ``.rdd`` on a
plan containing shuffles materializes the upstream query stages (runs
real jobs) at call time, and that work is not reused by the later action.
Instead the probe builds the *non-adaptive* physical plan
(``queryExecution().sparkPlan()``) — for a shuffle-free plan,
``execute()`` on it is a lazy RDD-DAG construction, no job. Plans that
DO contain a shuffle (join/aggregate/repartition upstream) are treated as
already wide and passed through untouched: their output width is decided
by ``spark.sql.shuffle.partitions`` / AQE, and adding another exchange on
top would be pure overhead at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Physical nodes whose presence means the frame's width is set by a
# shuffle (or by a cached plan), not by file splits. Probing .execute()
# through these could trigger work (broadcast futures, AQE stages), and
# widening them is unnecessary anyway — bail out as "wide".
_SHUFFLE_MARKERS = (
    "Exchange",
    "Join",
    "Aggregate",
    "Window",
    "InMemoryTableScan",
    "AdaptiveSparkPlan",
)


def _scan_width(df: DataFrame) -> int | None:
    """Split count of a shuffle-free plan; ``None`` when the plan contains
    a shuffle-inducing node (treat as already wide). Runs no jobs."""
    plan = df._jdf.queryExecution().sparkPlan()
    rendered = plan.toString()
    if any(marker in rendered for marker in _SHUFFLE_MARKERS):
        return None
    # lazy RDD construction on a scan/project/filter-only plan: for a
    # parquet scan this is the file split count — exactly the signal we
    # want — and no action runs.
    return plan.execute().getNumPartitions()


def widen_if_narrow(
    df: DataFrame,
    *key_cols: str | Column,
    min_partitions: int | None = None,
) -> DataFrame:
    """Repartition ``df`` to ``min_partitions`` (default: the session's
    ``defaultParallelism``) hash-partitioned on ``key_cols`` — but ONLY
    when the input is a scan narrower than that. Returns ``df`` unchanged
    (no added Exchange) when it is already at least that wide, or when its
    width is shuffle-determined (post-join/agg/repartition frames pass
    through untouched).

    Use this, not a bare ``repartition``, in front of every expensive
    text/vector projection: the explicit partition count stops AQE from
    coalescing the compute stage on tiny inputs, while wide at-scale
    inputs pass through shuffle-free.

    Caveat: the width this sees is the PLANNED byte-range split count.
    A parquet file written as one giant row group yields many planned
    splits but only ONE that emits rows (a row group is the atomic read
    unit) — measured at sf10, where a 53 MB single-row-group embeddings
    file planned 13 splits with 1 effective and serialized a fused
    N x Q scan (fixed by widening in pq_topk; the repartition separates
    compute parallelism from scan parallelism even though the READ
    itself stays single-threaded). Planned >= par with one row group —
    a single-row-group file bigger than maxPartitionBytes * par — would
    still pass through unwidened; the real cure for that input is
    fixing the writer (our sinks bound row-group size via shard
    repartitioning), since no reader can parallelize inside one group.
    """
    par = (
        min_partitions
        if min_partitions is not None
        else df.sparkSession.sparkContext.defaultParallelism
    )
    width = _scan_width(df)
    if width is None or width >= par:
        return df
    if key_cols:
        cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
        return df.repartition(par, *cols)
    return df.repartition(par)
