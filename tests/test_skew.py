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


def test_minhash_hot_band_bucket_cap(spark):
    """Boilerplate skew hazard: ~30% of docs share one text, so ONE band
    key holds all of them and the bucket self-join would build n(n-1)/2
    candidate pairs. max_band_bucket excises those buckets while normal
    near-dup pairs keep flowing; the skipped boilerplate cluster is exact
    dedup's job (documented in _drop_hot_buckets)."""
    from etl_bigquery_pipeline_spark.operators import dedup

    boiler = "all rights reserved contact us terms of service apply here"
    rows = [(i, boiler) for i in range(30)]  # 30% of corpus: ONE bucket
    rows += [(100 + i, f"unique document number {i} talks about topic {i} "
              f"in detail with extra words {i * 7}") for i in range(68)]
    rows += [
        (900, "spark engines process data with distributed execution today"),
        (901, "spark engines process data with distributed execution now"),
    ]  # a genuine near-dup pair outside the hot cluster
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    uncapped = dedup.minhash_near_dup_pairs(
        docs, threshold=0.3, bands=16, max_band_bucket=None
    ).collect()
    boiler_pairs = [r for r in uncapped if r.id_a < 30 and r.id_b < 30]
    assert len(boiler_pairs) == 30 * 29 // 2  # the quadratic blowup

    capped = dedup.minhash_near_dup_pairs(
        docs, threshold=0.3, bands=16, max_band_bucket=10
    ).collect()
    capped_pairs = {(r.id_a, r.id_b) for r in capped}
    assert not any(a < 30 and b < 30 for a, b in capped_pairs)
    assert (900, 901) in capped_pairs  # cold-bucket recall intact
    # exact dedup owns the boilerplate cluster the cap skipped
    kept = dedup.dedup_exact_text(docs, "doc_id", "text")
    assert kept.filter("doc_id < 30").count() == 1


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


def test_default_cap_keeps_boilerplate_subquadratic(spark):
    """Round-2 verdict item #8: the hot-bucket cap must default ON, so a
    production caller who never heard of max_band_bucket doesn't get a
    quadratic pair blowup from a boilerplate cluster. The cluster here is
    wider than the default cap; the genuine near-dup pair is not."""
    from etl_bigquery_pipeline_spark.operators import dedup as dd

    boiler = "all rights reserved contact us terms of service apply here"
    rows = [(i, boiler) for i in range(dd._DEFAULT_MAX_BAND_BUCKET + 200)]
    rows += [
        (10_000_000, "spark engines process data with distributed execution today"),
        (10_000_001, "spark engines process data with distributed execution now"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    pairs = {(r.id_a, r.id_b)
             for r in dd.minhash_near_dup_pairs(docs, threshold=0.3).collect()}
    assert not any(a < 10_000_000 and b < 10_000_000 for a, b in pairs)
    assert (10_000_000, 10_000_001) in pairs

    sim = {(r.id_a, r.id_b)
           for r in dd.simhash_near_dup_pairs(docs, max_hamming=8).collect()}
    assert not any(a < 10_000_000 and b < 10_000_000 for a, b in sim)
