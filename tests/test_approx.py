"""Approximate-operator bounds: HLL++ error and LSH recall measured
against exact ground truth (these can't be oracle-matched by design)."""

from __future__ import annotations

from etl_bigquery_pipeline_spark.plans import catalog


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    row = catalog.QUERIES["approx_distinct_orders"](spark, sf_dir).first()
    # rsd=0.02 -> generous 3-sigma-ish bound
    assert abs(row.approx_custkeys - row.exact_custkeys) <= 0.06 * row.exact_custkeys
    assert row.n_rows > 0


def test_lsh_topk_recall_against_exact(spark, sf_dir):
    exact = catalog.QUERIES["similarity_topk"](spark, sf_dir)
    approx = catalog.QUERIES["lsh_cosine_topk"](spark, sf_dir)
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    approx_rows = approx.collect()
    approx_pairs = {(r.query_id, r.neighbor_id) for r in approx_rows}
    # approximate scores are exact cosines (approximation is in candidate
    # generation only)
    sims = {(r.query_id, r.neighbor_id): r.sim for r in exact.collect()}
    for r in approx_rows:
        key = (r.query_id, r.neighbor_id)
        if key in sims:
            assert sims[key] == r.sim
    # 4-bit LSH on 64-dim vectors: same-bucket candidates should recover a
    # reasonable share of the true top-5
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.2, f"recall collapsed: {recall}"


def test_ivf_topk_recall_beats_lsh(spark, sf_dir):
    exact = {
        (r.query_id, r.neighbor_id)
        for r in catalog.QUERIES["similarity_topk"](spark, sf_dir).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in catalog.QUERIES["ivf_cosine_topk"](spark, sf_dir).collect()
    }
    recall = len(exact & ivf) / len(exact)
    # nprobe/nlist = 1/4 of the corpus scanned; cells follow the data so
    # recall should be comfortably above that fraction
    assert recall >= 0.3, f"IVF recall: {recall}"
