"""Distributed logistic-regression quality classifier (operators/quality_model).

The oracle parity of the full trajectory is covered by the catalog queries
(logreg_quality_scores / logreg_training_gate); these tests pin the
operator-level contracts: featurization determinism, bounded driver
traffic, loss monotonicity on a learnable label, and scoring semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_bigquery_pipeline_spark.operators import quality_model as QM
from etl_bigquery_pipeline_spark.sources.readers import read_table

SF0001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def feats(spark):
    return QM.doc_features(read_table(spark, SF0001, "documents"))


def test_features_schema_and_ranges(feats):
    rows = feats.collect()
    assert {f.name for f in feats.schema.fields} == {"doc_id", "x1", "x2", "x3", "y"}
    for r in rows:
        assert r.x1 > 0 and r.x2 > 0
        assert 0.0 < r.x3 <= 1.0
        assert r.y in (0.0, 1.0)


def test_features_deterministic(feats, spark):
    a = sorted(map(tuple, feats.collect()))
    b = sorted(map(tuple, QM.doc_features(read_table(spark, SF0001, "documents")).collect()))
    assert a == b


def test_label_matches_threshold(feats, spark):
    d = read_table(spark, SF0001, "documents").select("doc_id", "n_chars")
    joined = feats.join(d, "doc_id").collect()
    for r in joined:
        assert r.y == (1.0 if r.n_chars >= QM.LABEL_CHARS_THRESHOLD else 0.0)


def test_training_loss_monotone_and_weights_finite(feats):
    tr = QM.train_logreg(feats)
    assert len(tr.weights) == 4
    assert len(tr.losses) == QM.DEFAULT_ITERS + 1
    # label is learnable from x1 => GD at the default lr must descend
    for a, b in zip(tr.losses, tr.losses[1:]):
        assert b < a + 1e-9
    assert tr.losses[-1] < tr.losses[0]
    assert all(isinstance(w, float) for w in tr.weights)


def test_scores_separate_classes(feats):
    tr = QM.train_logreg(feats)
    scored = QM.score_documents(feats, tr.weights).join(
        feats.select("doc_id", "y"), "doc_id"
    )
    m = scored.groupBy("y").agg(F.avg("score").alias("s")).collect()
    by_label = {r.y: r.s for r in m}
    # positive class must score strictly higher on average
    assert by_label[1.0] > by_label[0.0]


def test_scores_bounded_and_pred_consistent(feats):
    tr = QM.train_logreg(feats)
    for r in QM.score_documents(feats, tr.weights).collect():
        assert 0.0 <= r.score <= 1.0
        assert r.pred_high_quality == (r.score >= 0.5)
