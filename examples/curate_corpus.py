"""End-to-end corpus curation, composed exactly as a user would: ingest
-> data quality -> dedup -> quality filter -> mixture -> split -> write,
with load metrics observed on the write pass and calendar retention on
the output layout.

Run:  python examples/curate_corpus.py [sf_dir] [out_dir]

Every stage is one lazy lineage until the single write action; the
observe() metrics ride that action (no second scan). At cluster scale
the same script runs under spark-submit unchanged (see README
"Deploying at cluster scale").
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_bigquery_pipeline_spark.operators import dedup, sampling
from etl_bigquery_pipeline_spark.plans import dq
from etl_bigquery_pipeline_spark.session import get_session
from etl_bigquery_pipeline_spark.sources.readers import read_table


def curate(spark, sf_dir: str, out_dir: str) -> dict:
    docs = read_table(spark, sf_dir, "documents")

    # 1. Gate the input before spending compute on it.
    dq.enforce(
        dq.TableChecks(
            "documents",
            docs,
            [dq.row_count_check(1), dq.null_check(["doc_id", "text"])],
        ).run()
    )

    # 2. Exact dedup (content hash, lowest id wins).
    deduped = dedup.dedup_exact_text(docs, "doc_id", "text")

    # 3. Quality: a static token floor PLUS the learned filter — train a
    #    logistic regression on document features (each GD iteration is
    #    one scan + a 4-double reduce) and keep docs scoring >= 0.3.
    from etl_bigquery_pipeline_spark.functions.text import token_count
    from etl_bigquery_pipeline_spark.operators import quality_model

    feats = quality_model.doc_features(deduped)
    trained = quality_model.train_logreg(feats)
    scores = quality_model.score_documents(feats, trained.weights)
    kept = (
        deduped.join(scores.filter(F.col("score") >= 0.3), "doc_id")
        .drop("score", "pred_high_quality")
        .withColumn("n_tok", token_count("text"))
        .filter(F.col("n_tok") >= 20)
    )
    srcs = [r.source for r in docs.select("source").distinct().collect()]
    fractions = {s: (1.0 if int(s[3:]) % 2 == 0 else 0.25) for s in srcs}
    mixed = sampling.resample_to_mixture(kept, "source", fractions, "doc_id")
    final = sampling.hash_split(
        mixed, "doc_id", weights={"train": 0.8, "val": 0.1, "test": 0.1}
    )

    # 4. One write action, metrics observed on it, split-partitioned
    #    layout so downstream training jobs prune to their split.
    metrics = dq.observed_write(
        final,
        lambda df: df.write.mode("overwrite")
        .partitionBy("split")
        .parquet(out_dir),
        metrics={
            "sum_tokens": F.sum("n_tok"),
            "n_null_text": F.sum(F.col("text").isNull().cast("int")),
        },
    )
    return metrics


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_corpus"
    spark = get_session("curate-corpus")
    spark.sparkContext.setLogLevel("ERROR")
    metrics = curate(spark, sf_dir, out_dir)
    print({k: str(v) for k, v in metrics.items()})
    spark.stop()


if __name__ == "__main__":
    main()
