"""Continuous ingest, composed exactly as a user would run it: bootstrap
a corpus (band index + quality model) once, then keep a drop-directory
stream curating every new batch — exact dedup, near-dup routing against
everything seen so far, learned quality filtering, curated output.

Run:  python examples/continuous_ingest.py [sf_dir] [work_dir]

The stream uses trigger(availableNow) so the script drains what's
present and exits; in production the same call runs with a processing-
time trigger and never returns. Re-running the script resumes from the
checkpoint — already-applied batches are skipped (exactly-once), new
files picked up.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_bigquery_pipeline_spark.operators import dedup, quality_model
from etl_bigquery_pipeline_spark.session import get_session
from etl_bigquery_pipeline_spark.sources.readers import read_table
from etl_bigquery_pipeline_spark.streaming import curation_stream

INDEX_TABLE = "continuous_ingest_idx"


def bootstrap(spark, sf_dir: str) -> tuple[list[float], float]:
    """One-time: index the existing corpus, train the quality model, and
    set the keep threshold DATA-DRIVEN — the 25th percentile of the
    corpus's own scores ("keep the top 75%"), so the cutoff tracks the
    model rather than a magic constant. Returns (weights, threshold)."""
    docs = read_table(spark, sf_dir, "documents")
    dedup.build_band_index(
        docs.select("doc_id", "text"), INDEX_TABLE
    )
    feats = quality_model.doc_features(docs)
    trained = quality_model.train_logreg(feats)
    threshold = (
        quality_model.score_documents(feats, trained.weights)
        .agg(F.percentile_approx("score", 0.25).alias("p"))
        .first()["p"]
    )
    return trained.weights, float(threshold)


def seed_feed(spark, sf_dir: str, feed_dir: str) -> None:
    """Simulate a drop of new documents: two near-copies of corpus docs,
    one junk fragment, two genuinely new documents."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    near = docs.limit(2).select(
        (F.col("doc_id") + 9_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" trailing edit")).alias("text"),
    )
    words = (
        "entirely new reporting covering fresh topics with measurable "
        "substance detailed context careful sourcing thorough analysis "
        "numbered findings cross checked results tabulated appendices "
        "verified quotations archived references annotated figures "
        "reviewed methodology documented caveats reproducible steps"
    ).split()
    long_doc = " ".join(words * 3)  # ~100 tokens, upper-quartile length
    fresh = spark.createDataFrame(
        [
            (9_100_001, long_doc),
            (9_100_002, "ok"),  # junk fragment: should be rejected
        ],
        "doc_id long, text string",
    )
    near.unionAll(fresh).coalesce(1).write.mode("append").parquet(feed_dir)


def run(spark, sf_dir: str, work_dir: str) -> dict:
    weights, threshold = bootstrap(spark, sf_dir)
    feed = os.path.join(work_dir, "feed")
    seed_feed(spark, sf_dir, feed)
    q = curation_stream.curation_sink(
        spark.readStream.schema("doc_id long, text string").parquet(feed),
        INDEX_TABLE,
        os.path.join(work_dir, "ckpt"),
        os.path.join(work_dir, "curated"),
        os.path.join(work_dir, "duplicates"),
        os.path.join(work_dir, "rejects"),
        quality_weights=weights,
        quality_threshold=threshold,
    )
    q.awaitTermination()
    stats = {}
    for name in ("curated", "duplicates", "rejects"):
        path = os.path.join(work_dir, name)
        try:
            stats[name] = spark.read.parquet(path).count()
        except Exception:
            stats[name] = 0
    return stats


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/continuous_ingest"
    spark = get_session("continuous-ingest")
    spark.sparkContext.setLogLevel("ERROR")
    print(run(spark, sf_dir, work))
    spark.sql(f"DROP TABLE IF EXISTS {INDEX_TABLE}")
    spark.sql(f"DROP TABLE IF EXISTS {INDEX_TABLE}__meta")
    spark.stop()


if __name__ == "__main__":
    main()
