"""Salted-join equivalence: result must equal the plain join while the
shuffle key gains the salt dimension."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_bigquery_pipeline_spark.operators import skew


def _skewed(spark):
    # hot key: 900 of 1000 rows share k=1
    rows = [(1 if i < 900 else i, i) for i in range(1000)]
    big = spark.createDataFrame(rows, "k bigint, v bigint")
    small = spark.createDataFrame(
        [(1, "hot"), (950, "cold")], "k bigint, label string"
    )
    return big, small


def test_salted_inner_join_matches_plain(spark):
    big, small = _skewed(spark)
    plain = big.join(small, ["k"], "inner")
    salted = skew.salted_join(big, small, ["k"], buckets=8)
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_left_join_matches_plain(spark):
    big, small = _skewed(spark)
    plain = big.join(small, ["k"], "left")
    salted = skew.salted_join(big, small, ["k"], buckets=4, how="left")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_join_rejects_outer_variants(spark):
    import pytest

    big, small = _skewed(spark)
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="inner/left"):
            skew.salted_join(big, small, ["k"], how=how)


def test_deterministic_salt_spreads_hot_key(spark):
    big, _ = _skewed(spark)
    salted = skew.with_salt(big, 8, deterministic_by="v")
    spread = (
        salted.filter("k = 1")
        .groupBy(skew.SALT_COL)
        .count()
        .count()
    )
    assert spread == 8  # hot key occupies all salt buckets
