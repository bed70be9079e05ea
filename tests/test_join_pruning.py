"""Bloom-style pre-shuffle join pruning (operators/join_pruning)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_bigquery_pipeline_spark.operators import join_pruning as JP

SF0001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables(spark):
    l = spark.read.parquet(f"{SF0001}/lineitem.parquet")
    p = (
        spark.read.parquet(f"{SF0001}/part.parquet")
        .filter(F.col("p_size") <= 5)
        .select(F.col("p_partkey").alias("l_partkey"), "p_brand")
    )
    return l, p


def test_membership_codes_bounded(tables, spark):
    _, p = tables
    m = 64
    codes = JP.membership_codes(p, "l_partkey", m).collect()
    assert len(codes) <= m
    assert all(0 <= r["__code"] < m for r in codes)


def test_no_false_negatives(tables):
    l, p = tables
    codes = JP.membership_codes(p, "l_partkey", 64)
    pruned = JP.prune_by_membership(l, codes, "l_partkey", 64)
    # every fact row whose key exists in dim must survive the prune
    matching = l.join(p.select("l_partkey").distinct(), "l_partkey", "left_semi")
    lost = matching.join(pruned, ["l_orderkey", "l_linenumber"], "left_anti")
    assert lost.count() == 0


def test_parity_with_plain_join(tables):
    l, p = tables
    plain = sorted(map(tuple, l.join(p, "l_partkey").collect()))
    # tiny m => heavy false positives => the exact join must still dedupe
    for m in (16, JP.DEFAULT_CODE_SPACE):
        pruned = sorted(map(tuple, JP.bloom_pruned_join(l, p, "l_partkey", m=m).collect()))
        assert pruned == plain


def test_prune_actually_drops_rows(tables):
    l, p = tables
    # selective dim + large code space => the prune must bite
    tiny = p.limit(3)
    pruned = JP.prune_by_membership(
        l, JP.membership_codes(tiny, "l_partkey"), "l_partkey"
    )
    assert pruned.count() < l.count()


def test_rejects_outer_joins(tables):
    l, p = tables
    with pytest.raises(ValueError):
        JP.bloom_pruned_join(l, p, "l_partkey", how="left")


def test_plan_shape_broadcast_semi_before_join(tables):
    l, p = tables
    df = JP.bloom_pruned_join(l, p, "l_partkey")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
