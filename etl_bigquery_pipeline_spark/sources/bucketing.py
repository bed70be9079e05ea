"""Bucketed tables: co-located joins without runtime shuffles.

At 100 TB, a fact⋈fact join (orders ⋈ lineitem on orderkey) shuffles both
sides every query unless the tables are written bucketed on the join key.
``write_bucketed`` persists a table bucketed+sorted by key via
saveAsTable; joins between two tables bucketed the same way plan with zero
Exchange on either side (verified in tests/test_bucketing.py by asserting
the physical plan has no shuffle).

Bucket-count rule of thumb: total-size / 128 MB, rounded to a power of two
shared by every table that joins on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: str,
    buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) managed table."""
    writer = df.write.mode(mode).bucketBy(buckets, bucket_by)
    if sort:
        writer = writer.sortBy(bucket_by)
    writer.saveAsTable(table)


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains an Exchange (shuffle)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan
