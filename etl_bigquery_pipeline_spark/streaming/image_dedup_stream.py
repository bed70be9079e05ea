"""Streaming image near-dup dedup against a persisted dHash band index —
the multimodal twin of `streaming/dedup_stream.py` (text tier). A
training-data pipeline runs both: documents probe the MinHash band
index, images probe the dHash band index, and both loops share the same
exactly-once discipline.

Per micro-batch work: decode + dHash ONCE per image (Arrow-batched;
the hashed frame persists for the batch's duration — the r7 rehearsal
measured ~5 source scans per micro-batch when each sink recomputed its
lineage), exact in-batch dedup on payload md5, one broadcast probe of
the batch's band keys against the bucketed index, and one append pass
for the novel hashes. Nothing scales with corpus size; payload bytes
never shuffle for the probe (only 8-byte hashes + band keys move).

Routing: undecodable payloads (codec-gated, junk) -> ``reject_dir``
(they have no perceptual hash to dedup on — the DLQ discipline);
near-dups of the corpus -> ``dup_dir`` with (id, corpus_id, hamming)
evidence; novel images -> ``out_dir`` AND their bands append to the
index, so a near-copy arriving in a LATER batch collides with them.

Exactly-once: parquet outputs write to `batch_id=N` directories with
overwrite (idempotent under replay); the band-index INSERT is not
naturally idempotent, so an applied-batch marker commits AFTER the
insert and a replayed batch whose marker exists is skipped whole —
the same contract as dedup_stream/ann_stream. The crash window BETWEEN
the insert and the marker commit is closed by a second, "inserting"
pre-marker (r8 ADVICE): a replay that finds the pre-marker without the
commit marker re-runs the append in recovery mode, which anti-joins
the batch's band rows against the index first — one extra index scan
on that rare path only, zero duplicate rows ever.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def incremental_image_dedup_sink(
    images: DataFrame,
    index_table: str,
    checkpoint: str,
    out_dir: str,
    dup_dir: str,
    reject_dir: str,
    *,
    max_hamming: int = 3,
    id_col: str = "id",
    binary_col: str = "payload",
):
    """Start the image-dedup stream; returns the StreamingQuery.

    ``index_table`` must exist (`multimodal.dhash_index.build_dhash_index`
    owns the band geometry). Novel images -> ``out_dir/batch_id=N``
    (full payload rows); corpus near-dups -> ``dup_dir/batch_id=N`` as
    (id, corpus_id, hamming); undecodable -> ``reject_dir/batch_id=N``.
    """
    from etl_bigquery_pipeline_spark.multimodal import binary_ops, dhash_index

    marker_dir = os.path.join(checkpoint, "__applied_batches")
    os.makedirs(marker_dir, exist_ok=True)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(marker_dir, f"batch_{batch_id}")
        pre_marker = marker + ".__inserting"
        if os.path.exists(marker):  # replay of an applied batch: skip
            # a crash between the commit-marker rename and the
            # pre-marker removal leaves a stale __inserting file that
            # this short-circuit would otherwise preserve forever —
            # sweep it here so marker_dir never misreads a committed
            # batch as in-flight (r9 ADVICE)
            try:
                os.remove(pre_marker)
            except FileNotFoundError:
                pass
            return
        # two-marker protocol (r8 ADVICE): an "inserting" pre-marker
        # lands BEFORE the index append; the commit marker lands after.
        # A replay that finds the pre-marker but not the commit marker
        # knows the previous attempt died inside the crash window
        # between insert and commit — only THAT rare path pays the
        # idempotent (anti-join) append, so duplicate index rows can't
        # accumulate while the normal path stays one-pass.
        recovery = os.path.exists(pre_marker)
        spark = batch_df.sparkSession
        # exact in-batch dedup first: identical payloads collapse to the
        # smallest id (deterministic), so re-uploads inside one batch
        # neither probe twice nor enter the index twice
        batch = (
            batch_df.withColumn("__md5", F.md5(F.col(binary_col)))
            .withColumn(
                "__rk",
                F.row_number().over(
                    Window.partitionBy("__md5").orderBy(F.col(id_col))
                ),
            )
            .filter(F.col("__rk") == 1)
            .drop("__md5", "__rk")
            .persist()
        )
        hashed = binary_ops.with_perceptual_hash(
            batch, id_col=id_col, binary_col=binary_col
        ).persist()  # decode+dHash once; probe AND append reuse it
        ok_hashes = hashed.filter(F.col("ok")).select(id_col, "phash")
        matches = dhash_index.near_dup_candidates_from_dhash_index(
            spark, ok_hashes, index_table, max_hamming=max_hamming
        )
        if recovery:
            # the crashed attempt already appended this batch's novel
            # band rows, so a recovery probe sees the batch's OWN ids
            # on the corpus side: every previously-novel image collides
            # with itself (hamming 0) and would be routed to dup_dir as
            # a bogus (id, id, 0) pair while out_dir loses its payload
            # rows. Ids are globally unique, so any corpus_id in the
            # batch id set can only be the crashed attempt's own insert
            # — excluding them reproduces the routing the crashed
            # attempt computed (in-batch near-dup pairs are likewise
            # not dup-routed on the normal path, where the probe runs
            # before the append). (r9 ADVICE, high)
            matches = matches.join(
                batch.select(F.col(id_col).alias("corpus_id")),
                "corpus_id",
                "left_anti",
            )
        # one image can collide with many corpus images: keep the
        # closest match (tie -> smallest corpus id) as evidence,
        # route the image once
        best = (
            matches.groupBy("batch_id")
            .agg(F.min(F.struct("hamming", "corpus_id")).alias("m"))
            .select(
                F.col("batch_id").alias(id_col),
                F.col("m.corpus_id").alias("corpus_id"),
                F.col("m.hamming").alias("hamming"),
            )
        ).persist()
        try:
            best.write.mode("overwrite").parquet(
                os.path.join(dup_dir, f"batch_id={batch_id}")
            )
            rejects = batch.join(
                hashed.filter(~F.col("ok")).select(id_col), id_col, "semi"
            )
            rejects.write.mode("overwrite").parquet(
                os.path.join(reject_dir, f"batch_id={batch_id}")
            )
            novel = (
                batch.join(hashed.filter(~F.col("ok")).select(id_col),
                           id_col, "left_anti")
                .join(best.select(id_col), id_col, "left_anti")
            )
            novel.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"batch_id={batch_id}")
            )
            # novel hashes become corpus for every later batch; read the
            # novel ids back from the committed output (replay-stable)
            novel_ids = spark.read.parquet(
                os.path.join(out_dir, f"batch_id={batch_id}")
            ).select(id_col)
            with open(pre_marker, "w"):
                pass  # pre-marker: the index append starts now
            dhash_index.append_to_dhash_index(
                ok_hashes.join(novel_ids, id_col, "semi"),
                index_table,
                recovery=recovery,
            )
        finally:
            batch.unpersist()
            hashed.unpersist()
            best.unpersist()
        staging = marker + ".__tmp"
        with open(staging, "w"):
            pass
        os.rename(staging, marker)  # marker lands only after the insert
        os.remove(pre_marker)

    return (
        images.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
