"""Incremental-curation operators: cross-corpus dedup, mixture
resampling, boilerplate profiling, heavy hitters."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_bigquery_pipeline_spark.operators import dedup, sampling, skew


def test_exact_against_corpus_drops_planted_and_within_batch(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 2 == 1)
    # batch: 5 novel docs, 3 copies of corpus docs, 1 within-batch dup pair
    novel = d.filter(F.col("doc_id") % 2 == 0).limit(5)
    copies = corpus.limit(3).select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text"
    )
    dup_of_novel = novel.limit(1).select(
        (F.col("doc_id") + 20_000).alias("doc_id"), "text"
    )
    batch = novel.unionAll(copies).unionAll(dup_of_novel)
    surv = {r.doc_id for r in dedup.dedup_exact_against_corpus(batch, corpus).collect()}
    novel_ids = {r.doc_id for r in novel.collect()}
    assert surv == novel_ids  # copies dropped, within-batch dup keeps min id


def test_near_dup_against_corpus_finds_planted(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") < 40)
    planted = corpus.limit(5).select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.concat("text", F.lit(" tail token")).alias("text"),
    )
    pairs = dedup.near_dup_against_corpus(
        planted, corpus, threshold=0.6, max_band_bucket=None
    ).collect()
    matched = {r.batch_id - 10_000 for r in pairs}
    assert {r.doc_id for r in corpus.limit(5).collect()} <= matched
    assert all(0.6 <= r.jaccard_sim <= 1.0 for r in pairs)


def test_resample_to_mixture_partition_independent(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fr = {"src0": 0.0, "src1": 1.0}
    a = {r.doc_id for r in
         sampling.resample_to_mixture(d, "source", fr, "doc_id", default=0.5).collect()}
    b = {r.doc_id for r in
         sampling.resample_to_mixture(
             d.repartition(7), "source", fr, "doc_id", default=0.5
         ).collect()}
    assert a == b
    srcs = {r.source for r in d.filter(F.col("doc_id").isin(list(a))).select("source").distinct().collect()}
    assert "src0" not in srcs  # fraction 0 drops the stratum entirely
    n_src1 = d.filter(F.col("source") == "src1").count()
    kept_src1 = d.filter(F.col("doc_id").isin(list(a)) & (F.col("source") == "src1")).count()
    assert kept_src1 == n_src1  # fraction 1 keeps the stratum entirely


def test_boilerplate_stats_bounds(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = dedup.boilerplate_shingle_stats(
        d, shingle_n=1, df_frac=0.01, max_ratio=0.5
    ).collect()
    assert len(out) == d.count()
    for r in out:
        assert 0 <= r.n_boiler <= r.n_shingles
        assert 0.0 <= r.boiler_ratio <= 1.0
        assert r.keep == (r.n_boiler / r.n_shingles <= 0.5)


def test_heavy_hitters_deterministic_and_ordered(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    hh = skew.heavy_hitters(e, ["user_id"], k=10).collect()
    assert len(hh) == min(10, e.select("user_id").distinct().count())
    ns = [r.n for r in hh]
    assert ns == sorted(ns, reverse=True)
    assert [r.rnk for r in hh] == list(range(1, len(hh) + 1))
    assert abs(hh[-1].cum_share - sum(r.share for r in hh)) < 1e-4
    # ties break on the key ascending -> rerun is byte-identical
    again = skew.heavy_hitters(e.repartition(5), ["user_id"], k=10).collect()
    assert [(r.user_id, r.n, r.rnk) for r in hh] == [
        (r.user_id, r.n, r.rnk) for r in again
    ]
