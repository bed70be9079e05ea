"""Property-based tests (hypothesis): invariants that must hold for any
input, not just fixtures. Kept small — each property runs Spark jobs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_bigquery_pipeline_spark.functions import coercion
from etl_bigquery_pipeline_spark.operators import dedup

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

words = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=4), min_size=1, max_size=12
)


@SLOW
@given(ws=words)
def test_content_hash_whitespace_invariant(spark, ws):
    """Any whitespace layout of the same tokens hashes identically."""
    from etl_bigquery_pipeline_spark.functions.text import content_hash
    import pyspark.sql.functions as F

    normal = " ".join(ws)
    weird = "  " + "\t ".join(ws) + "   "
    df = spark.createDataFrame([(normal,), (weird,)], ["t"])
    hashes = [r.h for r in df.select(content_hash("t").alias("h")).collect()]
    assert hashes[0] == hashes[1]


@SLOW
@given(ws=words)
def test_jaccard_self_similarity_is_one(spark, ws):
    import pyspark.sql.functions as F

    text = " ".join(ws)
    df = spark.createDataFrame([(1, text), (2, text)], ["doc_id", "text"])
    pairs = dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", shingle_n=2, threshold=0.0, block_width=10
    ).collect()
    assert len(pairs) == 1 and pairs[0].jaccard_sim == 1.0


@SLOW
@given(
    vals=st.lists(
        st.one_of(
            st.integers(-10**6, 10**6).map(str),
            st.text(alphabet="xyz.", min_size=1, max_size=5),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_long_coercion_never_raises(spark, vals):
    """errors='coerce' semantics: any string input yields value-or-null,
    never an exception (ANSI mode notwithstanding)."""
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    out = df.select(coercion.to_long_or_null("v").alias("x")).collect()
    for src, row in zip(vals, out):
        try:
            expect = int(float(src))
        except ValueError:
            expect = None
        assert row.x == expect
