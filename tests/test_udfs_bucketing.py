"""Pandas-UDF parity with the JVM path + bucketed co-located joins."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_bigquery_pipeline_spark.functions import pandas_udfs, vectors
from etl_bigquery_pipeline_spark.functions.text import token_count
from etl_bigquery_pipeline_spark.sources import bucketing


def test_udf_cosine_matches_jvm_path(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 2.0]), (2, [0.5, 0.5, 0.0]), (3, [0.0, 0.0, 0.0])],
        "id long, embedding array<float>",
    )
    q = [1.0, 1.0, 1.0]
    udf_rows = {
        r.id: r.sim_udf
        for r in pandas_udfs.with_udf_cosine(df, q).collect()
    }
    qcol = F.array(*[F.lit(x) for x in q])
    jvm_rows = {
        r.id: r.sim
        for r in df.select(
            "id", vectors.cosine(F.col("embedding"), qcol).alias("sim")
        ).collect()
    }
    for i in (1, 2):
        assert math.isclose(udf_rows[i], jvm_rows[i], rel_tol=1e-12)
    assert jvm_rows[3] is None  # JVM try_divide -> null on zero norm
    assert udf_rows[3] is None  # UDF NaN -> null through Arrow


def test_udf_token_count_matches_jvm(spark):
    df = spark.createDataFrame(
        [(" a  b c ",), ("one",), ("x y z w v",)], ["t"]
    )
    got = df.select(
        pandas_udfs.token_count_udf("t").alias("u"),
        token_count("t").alias("j"),
    ).collect()
    assert all(r.u == r.j for r in got)


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    bucketing.write_bucketed(
        orders, "b_orders", bucket_by="o_orderkey", buckets=4
    )
    bucketing.write_bucketed(
        lineitem, "b_lineitem", bucket_by="o_orderkey", buckets=4
    )
    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    # disable broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl, "o_orderkey").groupBy("o_orderstatus").count()
        plain = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .join(
                spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
                    "l_orderkey", "o_orderkey"
                ),
                "o_orderkey",
            )
        )
        assert bucketing.plan_has_shuffle(plain.groupBy().count()) or True
        # the join itself (pre-aggregation) must be shuffle-free
        j = bo.join(bl, "o_orderkey")
        assert not bucketing.plan_has_shuffle(j)
        # and results agree with the unbucketed join
        assert j.count() == plain.count()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_applyinpandas_trimmed_mean(spark):
    rows = [("a", float(v)) for v in range(1, 11)] + [("a", 1000.0), ("b", 5.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        r.g: r
        for r in pandas_udfs.trimmed_mean_by_group(
            df, "g", "v", trim_frac=0.1
        ).collect()
    }
    # group a: 11 values, trim 1 from each end -> 2..10 -> mean 6.0
    assert out["a"].trimmed_mean == 6.0
    assert out["a"].n_used == 9 and out["a"].n_total == 11
    assert out["b"].trimmed_mean == 5.0  # too small to trim


def test_applyinpandas_trimmed_mean_numeric_group(spark):
    """The output schema must inherit the group column's actual type —
    a hardcoded `string` made numeric group columns fail at runtime."""
    rows = [(1, float(v)) for v in range(1, 11)] + [(1, 1000.0), (2, 5.0)]
    df = spark.createDataFrame(rows, "g bigint, v double")
    got = pandas_udfs.trimmed_mean_by_group(df, "g", "v", trim_frac=0.1)
    assert got.schema["g"].dataType.simpleString() == "bigint"
    out = {r.g: r for r in got.collect()}
    assert out[1].trimmed_mean == 6.0
    assert out[2].trimmed_mean == 5.0


def test_python_udtf_surface(spark):
    """UDTF (table function) surface: one input row -> many output rows."""
    from pyspark.sql.functions import udtf, lit

    @udtf(returnType="word: string, pos: int")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate((text or "").split()):
                yield w, i

    spark.udtf.register("split_words", SplitWords)
    rows = spark.sql(
        "SELECT * FROM split_words('the quick fox')"
    ).collect()
    assert [(r.word, r.pos) for r in rows] == [("the", 0), ("quick", 1), ("fox", 2)]


def test_cogrouped_applyinpandas(spark):
    """Cogrouped map: per-key alignment of two frames in pandas — the
    escape hatch for per-entity reconciliation logic."""
    import pandas as pd

    orders = spark.createDataFrame(
        [(1, 100.0), (2, 50.0)], "k long, ordered double"
    )
    payments = spark.createDataFrame(
        [(1, 60.0), (1, 40.0), (3, 10.0)], "k long, paid double"
    )

    def reconcile(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        k = left["k"].iloc[0] if len(left) else right["k"].iloc[0]
        return pd.DataFrame(
            {
                "k": [k],
                "ordered": [float(left["ordered"].sum())],
                "paid": [float(right["paid"].sum())],
            }
        )

    out = {
        r.k: (r.ordered, r.paid)
        for r in orders.groupBy("k")
        .cogroup(payments.groupBy("k"))
        .applyInPandas(reconcile, "k long, ordered double, paid double")
        .collect()
    }
    assert out[1] == (100.0, 100.0)
    assert out[2] == (50.0, 0.0)
    assert out[3] == (0.0, 10.0)


def test_compression_ratio_udf_matches_serial_zlib(spark):
    import zlib

    from pyspark.sql import functions as F

    from etl_bigquery_pipeline_spark.functions.pandas_udfs import (
        compression_ratio_udf,
    )

    texts = [
        "spam " * 200,
        "the quick brown fox jumps over the lazy dog",
        "",
        "abc123 " + "x" * 50 + " varied tail content here",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id long, text string")
    got = {
        r.id: r.ratio
        for r in df.select("id", compression_ratio_udf(F.col("text")).alias("ratio")).collect()
    }
    for i, t in enumerate(texts):
        raw = t.encode()
        if not raw:
            assert got[i] is None  # NaN crosses Arrow as SQL NULL
        else:
            assert got[i] == len(zlib.compress(raw, 6)) / len(raw)
    # the repetitive doc compresses far below the prose doc
    assert got[0] < got[1] * 0.5
