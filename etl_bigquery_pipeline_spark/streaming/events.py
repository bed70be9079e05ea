"""Structured Streaming variants of the event analytics.

The reference is batch-only (SURVEY.md §2.8); these are the streaming
counterparts of operators/windows.py and operators/sessionize.py, same
aggregate contract, incremental execution. The batch versions are the
oracle-checked golden semantics; these run the identical aggregates over an
unbounded source with watermark-bounded state.

Tested via the rate/file sources in tests/test_streaming.py with
``trigger(availableNow=True)`` so a bounded batch flows through the real
streaming engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts_stream(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Watermarked tumbling-window aggregate. State per (window, keys) is
    dropped once the watermark passes window end — bounded state at any
    scale; late events beyond the watermark are discarded (the documented
    late-data policy)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("value_sum"),
        )
        .select(F.col("w.start").alias("window_start"), *keys, "n_events", "value_sum")
    )


def sliding_counts_stream(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Watermarked SLIDING-window aggregate — each event lands in
    window/slide overlapping windows (2 here), so state and output are
    that multiple of tumbling's; the watermark still bounds state by
    dropping windows once it passes their end. Batch twin:
    events_sliding_1h_30m (oracle-checked), so the streaming plan's
    semantics are pinned by the same arithmetic."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window, slide).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_events",
            "value_sum",
        )
    )


def session_stats_stream(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    value_col: str = "value",
) -> DataFrame:
    """Session-window aggregate (native session_window operator): sessions
    close when no event arrives within ``gap``; watermark bounds state.
    Batch golden equivalent: operators/sessionize.py session_stats."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), user_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            user_col,
            "n_events",
            "value_sum",
        )
    )


def run_available_now(stream_df: DataFrame, *, checkpoint: str) -> list:
    """Drain a bounded stream through the streaming engine into memory and
    return the rows — the test harness for streaming semantics."""
    import uuid

    name = f"sink_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}").collect()


def dedup_stream(
    events: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop repeated keys arriving within the
    watermark window (dropDuplicatesWithinWatermark keeps state bounded —
    plain dropDuplicates on a stream grows state forever). The streaming
    twin of operators.dedup/cleaning exact dedup."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def signup_followups_stream(
    signups: DataFrame,
    events: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: events within ``within`` after a signup by
    the same user — the streaming twin of the batch range join
    (catalog.range_join_signup_followups). Both sides carry watermarks and
    the join condition bounds event time on both ends, so each side's
    buffered state is watermark+window bounded.
    """
    s = (
        signups.withWatermark(ts_col, watermark)
        .select(
            F.col("event_id").alias("s_event_id"),
            F.col(user_col).alias("s_user_id"),
            F.col(ts_col).alias("s_ts"),
        )
    )
    e = events.withWatermark(ts_col, watermark).select(
        F.col("event_id").alias("e_event_id"),
        F.col(user_col).alias("e_user_id"),
        F.col(ts_col).alias("e_ts"),
    )
    return s.join(
        e,
        (F.col("e_user_id") == F.col("s_user_id"))
        & (F.col("e_ts") > F.col("s_ts"))
        & (F.col("e_ts") <= F.col("s_ts") + F.expr(f"INTERVAL {within}")),
        "inner",
    )


def signup_followups_left_stream(
    signups: DataFrame,
    events: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream LEFT OUTER join: every signup emits — matched
    follow-ups as they arrive, and signups with NO follow-up as a
    null-padded row once the watermark guarantees no match can still
    arrive (the engine cannot emit 'no match' earlier without risking a
    late contradiction — the null row is a watermark-certified fact).
    The conversion-funnel shape where the UNmatched side is the signal:
    signups that never activated. Same state bounds as the inner form;
    the left side additionally holds each signup until its
    no-match-possible point.

    Two operational facts the test pins: the global watermark is the
    MIN across both sides' watermarks (a quiet side freezes null
    emission for everyone), and null rows flush in the micro-batch
    AFTER the one that advanced the watermark — single-batch drains
    never emit them."""
    s = signups.withWatermark(ts_col, watermark).select(
        F.col("event_id").alias("s_event_id"),
        F.col(user_col).alias("s_user_id"),
        F.col(ts_col).alias("s_ts"),
    )
    e = events.withWatermark(ts_col, watermark).select(
        F.col("event_id").alias("e_event_id"),
        F.col(user_col).alias("e_user_id"),
        F.col(ts_col).alias("e_ts"),
    )
    return s.join(
        e,
        (F.col("e_user_id") == F.col("s_user_id"))
        & (F.col("e_ts") > F.col("s_ts"))
        & (F.col("e_ts") <= F.col("s_ts") + F.expr(f"INTERVAL {within}")),
        "leftOuter",
    )
