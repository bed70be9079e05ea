"""Persisted ANN index: the probe must (a) match the in-memory operator
value-for-value, (b) bucket-prune the corpus scan, and (c) never shuffle
the corpus — the only shuffle Exchange in a probe plan is the tiny
candidate-set window repartition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_bigquery_pipeline_spark.operators import ann_index, similarity
from etl_bigquery_pipeline_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") % 50 == 0)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_lsh_index_probe_matches_inmemory(spark, emb, queries):
    ann_index.build_lsh_index(
        emb, "ann_lsh_t", dim=64, bits=4, seed=42
    )
    got = ann_index.probe_lsh_index(spark, "ann_lsh_t", queries, k=5)
    want = similarity.lsh_cosine_topk(
        emb, queries, k=5, dim=64, bits=4, seed=42
    )
    assert _rows(got) == _rows(want)
    spark.sql("DROP TABLE IF EXISTS ann_lsh_t")
    spark.sql("DROP TABLE IF EXISTS ann_lsh_t__meta")


def test_ivf_index_probe_matches_inmemory(spark, emb, queries):
    ann_index.build_ivf_index(
        emb, "ann_ivf_t", nlist=16, seed=42
    )
    got = ann_index.probe_ivf_index(
        spark, "ann_ivf_t", queries, k=5, nprobe=4
    )
    want = similarity.ivf_cosine_topk(
        emb, queries, k=5, nlist=16, nprobe=4, seed=42
    )
    assert _rows(got) == _rows(want)
    spark.sql("DROP TABLE IF EXISTS ann_ivf_t")
    spark.sql("DROP TABLE IF EXISTS ann_ivf_t__meta")


def test_lsh_probe_plan_prunes_buckets_and_never_shuffles_corpus(
    spark, emb, queries
):
    ann_index.build_lsh_index(
        emb, "ann_lsh_plan_t", dim=64, bits=4, seed=42
    )
    try:
        probe = ann_index.probe_lsh_index(
            spark, "ann_lsh_plan_t", queries, k=5
        )
        plan = probe._jdf.queryExecution().executedPlan().toString()
        # bucket pruning reached the scan: only matching bucket files read
        assert "SelectedBucketsCount" in plan
        # the corpus flows scan -> broadcast join with ZERO shuffle; the
        # single shuffle Exchange is the candidate-set window repartition
        shuffles = [
            l for l in plan.splitlines() if "Exchange hashpartitioning" in l
        ]
        assert len(shuffles) == 1 and "query_id" in shuffles[0], shuffles
    finally:
        spark.sql("DROP TABLE IF EXISTS ann_lsh_plan_t")
        spark.sql("DROP TABLE IF EXISTS ann_lsh_plan_t__meta")
