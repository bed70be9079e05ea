"""Shared mechanics of the persisted band indexes (r8 verdict ask #6).

Two band-index families grew the same skeleton independently — the text
tier (MinHash over shingles, `operators.dedup.build_band_index`) and the
image tier (dHash bands, `multimodal.dhash_index`). Both persist
(id, band, key, payload) rows bucketed by the band key, probe by
broadcasting a batch's band keys against the bucketed layout, and append
new batches with a positional insertInto. This module is that skeleton,
extracted once so the next bucket-geometry or exactly-once bug has one
place to hide instead of two; the family modules keep the hashing that
makes them different (minhash signatures vs 64-bit dHash splits).

100 TB shape (inherited by both families): index rows are a few dozen
bytes per item regardless of payload size; probes ship batch-sized key
sets (broadcast) so the corpus side is a pruned bucket scan; appends are
one pass over the batch into the bucketed layout — the corpus is never
re-hashed, never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_BUCKETS = 64


def write_band_index(
    rows: DataFrame,
    table: str,
    bucket_col: str,
    meta: dict,
    *,
    n_buckets: int = N_BUCKETS,
) -> None:
    """Persist band rows bucketed by ``bucket_col`` + the build metadata.

    Repartitions on the bucket column (the same Murmur3 hash bucketBy
    uses) so each write task owns exactly one bucket — without it every
    upstream partition sorts and writes slices of all buckets (measured
    2x slower at bench scale, file count grows with upstream parallelism
    instead of staying == n_buckets). Metadata persists alongside so
    probes and appends can never disagree with the build's geometry.
    """
    from etl_bigquery_pipeline_spark.operators import ann_index

    spark = rows.sparkSession
    ann_index._reset_table(spark, table)
    (
        rows.repartition(n_buckets, bucket_col)
        .write.bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .mode("overwrite")
        .saveAsTable(table)
    )
    ann_index._write_meta(spark, table, meta)


def probe_collisions(
    spark: SparkSession,
    batch_rows: DataFrame,
    table: str,
    on_cols: list[str],
    *,
    index_filter=None,
) -> DataFrame:
    """Band-collision join: broadcast the batch's band rows against the
    bucketed index on ``on_cols``. Returns the joined frame with the
    index side aliased ``c`` and the batch side ``b`` — callers select
    and verify (exact Jaccard / popcount) downstream. Per-probe work
    scales with the batch and its collisions, never the corpus.

    ``index_filter`` (optional, DataFrame -> DataFrame) runs on the
    index scan before the join — e.g. the text tier's hot-bucket cap.
    """
    idx = spark.table(table)
    if index_filter is not None:
        idx = index_filter(idx)
    cond = None
    for c in on_cols:
        piece = F.col(f"c.{c}") == F.col(f"b.{c}")
        cond = piece if cond is None else (cond & piece)
    return idx.alias("c").join(F.broadcast(batch_rows.alias("b")), cond)


def append_band_rows(
    rows: DataFrame,
    table: str,
    bucket_col: str,
    *,
    dedupe_on: list[str] | None = None,
) -> None:
    """Insert a batch's band rows into the bucketed layout — one pass
    over the batch, corpus untouched. insertInto resolves by POSITION;
    the caller's projection must mirror the build's exactly. Id
    uniqueness across batches is the caller's contract.

    ``dedupe_on``: when set (crash-RECOVERY appends only — it costs one
    index scan), rows already present in the index under these columns
    are dropped first, making the append idempotent: probe the index
    with the batch's rows (inner join, batch side broadcast — bounded
    output), then anti-join the hits back. Normal-path appends must NOT
    pay this; see streaming/image_dedup_stream's two-marker protocol
    for how replays are detected.
    """
    spark = rows.sparkSession
    if dedupe_on:
        hits = (
            spark.table(table)
            .alias("c")
            .join(
                F.broadcast(rows.alias("b")),
                [F.col(f"c.{c}") == F.col(f"b.{c}") for c in dedupe_on],
                "semi",
            )
            .select(*dedupe_on)
            .distinct()
        )
        rows = rows.join(F.broadcast(hits), dedupe_on, "left_anti")
    rows.repartition(bucket_col).write.insertInto(table, overwrite=False)
