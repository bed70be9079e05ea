"""Time-window aggregations over events, batch semantics.

North-star tier (SURVEY.md §7.3): tumbling and sliding windows expressed so
the identical aggregate runs (a) in batch — oracle-checkable — and (b) in
Structured Streaming (streaming/events.py) with a watermark.

Tumbling windows group on date_trunc (a pure projection: the shuffle key is
the truncated timestamp, partial aggregation happens map-side). Sliding
windows explode each event into windows_per_event rows first — the standard
Spark formulation via F.window(slide=...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    unit: str = "hour",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Tumbling window: (window_start, *keys) -> count / exact sum / min / max."""
    return (
        df.groupBy(F.date_trunc(unit, F.col(ts_col)).alias("window_start"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,4)"))
            .cast("double")
            .alias("value_sum"),
            F.min(value_col).alias("value_min"),
            F.max(value_col).alias("value_max"),
        )
    )


def sliding_agg(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str = "30 minutes",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Sliding window via F.window: each event lands in window/slide
    overlapping windows. Output key is the window start timestamp."""
    return (
        df.groupBy(F.window(F.col(ts_col), window, slide).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,4)"))
            .cast("double")
            .alias("value_sum"),
        )
        .select(F.col("w.start").alias("window_start"), *keys, "n_events", "value_sum")
    )
