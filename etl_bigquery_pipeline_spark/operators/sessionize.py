"""Batch sessionization (gaps-and-islands) over event streams.

The reference has no streaming/stateful surface (SURVEY.md §2.8); this is
the north-star event-analytics operator in its oracle-checkable batch form.
The same semantics run incrementally in streaming/ via session_window +
watermark; this window-function formulation is the golden reference for it.

Plan shape: one shuffle on user_id (the window partition), then linear
scans — lag, running sum, aggregate. Skewed users (bots with millions of
events) are the 100 TB hazard; cap-per-user or salt the partition key
upstream if a user can exceed an executor's partition budget.

Timestamps compare exactly (interval arithmetic at native precision, no
second-truncation) so semantics are engine-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign session_seq/session_id per event: a new session starts when
    the gap since the user's previous event exceeds ``gap_minutes``.

    ``order_cols`` break ordering ties for users with identical timestamps
    (pass the event id for full determinism).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, *order_cols)
    prev_ts = F.lag(ts_col).over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (
            F.col(ts_col)
            > prev_ts + F.expr(f"INTERVAL {gap_minutes} MINUTES")
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_seq",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).withColumn(
        "session_id",
        F.concat_ws("#", F.col(user_col).cast("string"), F.col("session_seq")),
    )


def session_stats(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    value_col: str = "value",
    order_cols: tuple[str, ...] = (),
    keep_bounds: bool = False,
) -> DataFrame:
    """Per-session rollup: event count, span (microseconds), value sum.
    ``keep_bounds`` adds session_start/session_end timestamps for
    downstream day-keyed KPIs (bounce rate, session calendars)."""
    s = sessionize(
        df,
        user_col=user_col,
        ts_col=ts_col,
        gap_minutes=gap_minutes,
        order_cols=order_cols,
    )
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))).alias(
            "span_us"
        ),
        F.sum(F.col(value_col).cast("decimal(18,4)"))
        .cast("double")
        .alias("value_sum"),
    ]
    if keep_bounds:
        aggs += [
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        ]
    return s.groupBy(user_col, "session_seq").agg(*aggs)
