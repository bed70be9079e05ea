"""Aggregate navigation: pre-aggregated summary tables answering coarser
queries without touching the facts.

The warehouse summary-table pattern (Kimball aggregates / materialized
rollups): maintain ONE fine-grained additive rollup (e.g. daily x keys)
and derive every coarser granularity (weekly, monthly, per-key totals)
by re-aggregating the rollup — facts are scanned once at build/refresh
(or maintained incrementally by streaming/rollup_stream), and a monthly
query costs O(days x keys), not O(events).

Only ADDITIVE measures (count, sum, min, max) roll up freely; averages
must travel as (sum, count). This module keeps that rule by carrying the
pair explicitly — the same discipline rollup_stream documents for its
mergeable partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_daily_rollup(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """The finest-grain summary: one row per (day, keys) with additive
    measures. Persist this (or maintain it incrementally); every coarser
    question routes here."""
    return (
        events.withColumn("day", F.col(ts_col).cast("date"))
        .groupBy("day", *key_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,4)")).alias("value_sum"),
            F.min(value_col).alias("value_min"),
            F.max(value_col).alias("value_max"),
        )
    )


def rollup_to_monthly(
    daily: DataFrame, *, key_cols: tuple[str, ...] = ("event_type",)
) -> DataFrame:
    """Monthly answer FROM the daily rollup: additive measures re-merge;
    avg is finalized from (sum, count) — never averaged averages."""
    return (
        daily.withColumn("month", F.date_trunc("month", "day").cast("date"))
        .groupBy("month", *key_cols)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("value_sum").alias("value_sum"),
            F.min("value_min").alias("value_min"),
            F.max("value_max").alias("value_max"),
        )
        .withColumn(
            "value_avg",
            F.round(
                (F.col("value_sum") / F.col("n_events")).cast("double"), 4
            ),
        )
    )
