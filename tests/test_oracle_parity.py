"""Pre-flight for the driver's t2 gate: every catalog query must match its
DuckDB oracle at sf0.001 (fast; the driver re-checks at sf0.01)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_bigquery_pipeline_spark.plans import catalog
from tests.oracle_harness import compare, duckdb_connection

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(catalog.ORACLE))
def test_query_matches_oracle(spark, con, name):
    df = catalog.QUERIES[name](spark, SF)
    ok, msg = compare(df, con, catalog.ORACLE[name])
    assert ok, f"{name}: {msg}"


# Approximate operators (engine-specific sketches / probabilistic candidate
# sets) are rows-only by design; their bounds are asserted in test_approx.py
ROWS_ONLY = {
    "approx_distinct_orders",
    "lsh_cosine_topk",
    "ivf_cosine_topk",
    "pq_cosine_topk",
    # zlib is not SQL-expressible; pinned bit-for-bit to serial zlib in
    # pytest and gated by the oracled compression_quality_gate
    "compression_ratio_quality",
}


def test_all_queries_have_oracle_or_reason():
    missing = set(catalog.QUERIES) - set(catalog.ORACLE)
    assert missing == ROWS_ONLY, f"undocumented oracle-less queries: {missing - ROWS_ONLY}"


def test_oracled_schemas_are_atomic(spark):
    """The driver's canonicalizer (pandas sort_values -> factorize) cannot
    hash array/map/struct cells; every oracled query must emit only atomic
    leaf types (serialize lists with array_join, structs with named cols)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name in sorted(catalog.ORACLE):
        df = catalog.QUERIES[name](spark, SF)
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not offenders, f"non-atomic output columns: {offenders}"


def test_type_category_drift_is_caught(spark, con):
    """The driver's hash distinguishes int 13 from float 13.0; the
    harness's %.10g cell rendering does not (the round-5
    clamped_running_inventory red shipped through a green local sweep
    exactly this way). compare() must now fail a seeded int-vs-float
    drift on its own, before any value comparison could pass it."""
    df = spark.range(1).select(F.lit(13).cast("bigint").alias("x"))
    ok, msg = compare(df, con, "SELECT 13.0::DOUBLE AS x")
    assert not ok and "type categories differ" in msg, msg
    # and the aligned pair passes
    ok, msg = compare(df, con, "SELECT 13::BIGINT AS x")
    assert ok, msg


def test_no_type_category_drift_catalogwide(spark, con):
    """Schema-only sweep of every oracled query: Spark dtype category
    must match DuckDB's bound result type category per column. Cheap
    (no job runs on either engine) and exactly the class the driver's
    type-sensitive hash punishes."""
    from tests.oracle_harness import type_mismatches

    offenders = []
    for name in sorted(catalog.ORACLE):
        df = catalog.QUERIES[name](spark, SF)
        rel = con.sql(catalog.ORACLE[name])
        for m in type_mismatches(df, rel):
            offenders.append(f"{name}: {m}")
    assert not offenders, offenders


def test_driver_sample_order_covers_unsampled():
    """__spark_entry__.queries() must list the never-driver-sampled set
    first (the driver samples the first ~50 registered queries per
    round). The invariant is derived from the recorded CORRECTNESS_r*.json
    files: _SAMPLE_FIRST must equal exactly the oracled catalog queries
    with no green driver row in any prior round — no rows-only names
    (they can never go green and would burn sample slots, the r04
    failure mode), no already-green names, none missing."""
    import json
    import pathlib

    import __spark_entry__ as entry

    qs = list(entry.queries())
    assert qs[: len(entry._SAMPLE_FIRST)] == entry._SAMPLE_FIRST

    repo = pathlib.Path(__file__).resolve().parents[1]
    green: set[str] = set()
    for path in sorted(repo.glob("CORRECTNESS_r*.json")):
        for name, row in json.load(open(path)).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                green.add(name)
    uncovered_oracled = [
        q for q in catalog.QUERIES if q in catalog.ORACLE and q not in green
    ]
    assert set(entry._SAMPLE_FIRST) == set(uncovered_oracled), {
        "missing": set(uncovered_oracled) - set(entry._SAMPLE_FIRST),
        "extra": set(entry._SAMPLE_FIRST) - set(uncovered_oracled),
    }


def test_survey_counts_match_catalog():
    """SURVEY.md §8.3's summary figures must track the artifact (the r4
    judge found them three waves stale): parse the 'catalog holds N
    queries: M DuckDB-oracled' and 'bench.py (K headline' figures and pin
    them to the live counts."""
    import pathlib
    import re
    import sys

    repo = pathlib.Path(__file__).resolve().parents[1]
    sys.path.insert(0, str(repo))
    import bench

    text = (repo / "SURVEY.md").read_text()
    m = re.search(r"catalog\s+holds (\d+) queries: (\d+) DuckDB-oracled", text)
    assert m, "SURVEY.md summary sentence not found"
    assert int(m.group(1)) == len(catalog.QUERIES)
    assert int(m.group(2)) == len(catalog.ORACLE)
    b = re.search(r"`bench\.py` \((\d+)\s*\nheadline", text) or re.search(
        r"`bench\.py` \((\d+) headline", text
    )
    assert b, "SURVEY.md bench sentence not found"
    assert int(b.group(1)) == len(bench.BENCH_QUERIES)
