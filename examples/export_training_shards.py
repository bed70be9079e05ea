"""Training-shard export, end to end: rule gate -> span dedup signal ->
waterfilled mixture -> deterministic epoch order -> sharded JSONL with a
manifest. The last mile of a data pipeline — what actually lands on the
training cluster's filesystem — composed from the same operators the
oracle-checked catalog verifies one by one.

Run:  python examples/export_training_shards.py [sf_dir] [out_dir]

Stage economics at 100 TB:
- the Gopher rule gate is one scan of pure JVM expressions, so it runs
  FIRST and cheaply shrinks everything downstream;
- the mixture pass needs only the per-source aggregate (waterfilling is
  closed-form on thousands of rows);
- per-document sampling against the waterfilled rate is a stateless
  md5 filter (no shuffle);
- the epoch permutation is ORDER BY md5(epoch:id) — a range sort, no
  RNG state, bit-identical on any cluster;
- the JSONL writer hash-shards and manifests row counts from ONE
  aggregate over the sharded frame.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_bigquery_pipeline_spark.functions import text as TX
from etl_bigquery_pipeline_spark.operators.caching import cache_scope, scoped_cache
from etl_bigquery_pipeline_spark.session import get_session
from etl_bigquery_pipeline_spark.sources.readers import read_table
from etl_bigquery_pipeline_spark.sources.sinks import write_jsonl_shards


def export(spark, sf_dir: str, out_dir: str, *, shards: int = 8) -> dict:
    docs = read_table(spark, sf_dir, "documents")

    # 1. Rule gate (Gopher-style): cheap JVM expressions, first.
    toks = TX.tokens("text")
    gated = (
        docs.withColumn("__n", F.size(toks))
        .withColumn(
            "__alpha",
            F.size(F.filter(toks, lambda x: x.rlike("^[A-Za-z]")))
            / F.greatest(F.col("__n"), F.lit(1)),
        )
        .filter((F.col("__n") >= 10) & (F.col("__alpha") >= 0.5))
        .drop("__n", "__alpha")
        .transform(scoped_cache)
    )

    # 2. Waterfilled mixture: per-source sampling rates under capacity
    #    caps (uniform target weights, budget = 80% of surviving tokens).
    caps = gated.groupBy("source").agg(
        F.sum(TX.token_count("text")).cast("double").alias("cap")
    )
    t = caps.agg(F.count(F.lit(1)).alias("n"), F.sum("cap").alias("total"))
    o = caps.crossJoin(F.broadcast(t)).select(
        "source", "cap",
        (F.lit(1.0) / F.col("n")).alias("w"),
        (F.col("cap") * F.col("n")).alias("ratio"),
        (F.lit(0.8) * F.col("total")).alias("b"),
    )
    cum = Window.orderBy("ratio", "source").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    lagw = Window.orderBy("ratio", "source")
    s = o.select(
        "*",
        F.sum("cap").over(cum).alias("cumc"),
        F.sum("w").over(cum).alias("cumw"),
        F.lag("ratio", 1, 0.0).over(lagw).alias("prev"),
    ).withColumn(
        "rj",
        (F.col("b") - (F.col("cumc") - F.col("cap")))
        / (F.lit(1.0) - (F.col("cumw") - F.col("w"))),
    )
    rstar = s.filter(
        (F.col("rj") >= F.col("prev")) & (F.col("rj") <= F.col("ratio"))
    ).agg(F.min("rj").alias("rstar"))
    rates = o.crossJoin(F.broadcast(rstar)).select(
        "source",
        F.least(F.lit(1.0), (F.col("rstar") * F.col("w")) / F.col("cap")).alias(
            "rate"
        ),
    )

    # 3. Per-document deterministic sampling at the source rate.
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit("mix:"),
               F.col("doc_id").cast("string"))), 1, 8), 16, 10).cast("bigint")
        % 10000
    )
    sampled = gated.join(F.broadcast(rates), "source").filter(
        bucket < F.col("rate") * 10000
    )

    # 4. Epoch-0 training order: reproducible permutation key. A global
    # orderBy here would be discarded by the writer's shard shuffle —
    # instead the writer sorts WITHIN each shard on epoch_key, and a
    # loader interleaving shards re-sorts on the carried column.
    ordered = sampled.withColumn(
        "epoch_key",
        F.md5(F.concat(F.lit("epoch:0:"), F.col("doc_id").cast("string"))),
    )

    # 5. Sharded JSONL + manifest.
    manifest = write_jsonl_shards(
        ordered.select("doc_id", "source", "lang", "text", "epoch_key"),
        out_dir,
        shards=shards,
        shard_key="doc_id",
        sort_within_shards="epoch_key",
    )
    return manifest


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/training_shards"
    spark = get_session("export-training-shards")
    with cache_scope():
        m = export(spark, sf_dir, out_dir)
    print({"total_rows": m["total_rows"], "shards": len(m["shards"])})
    spark.stop()
