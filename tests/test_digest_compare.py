"""Engine-side digest comparison (oracle_harness.digest_compare).

The sf10 sweep's comparison-bound tail (full-output queries whose VALUE
comparison, not computation, exceeded the budget) is verified in digest
mode: each engine canonicalizes cells to a shared string form, md5s the
row, and ships only COUNT(*) + 2x4 32-bit lane sums across the engine
boundary. These tests pin the canonicalization contract on every
supported type category, the failure modes (value drift, count drift,
int-vs-float category), and the dual-grid ulp tolerance.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.oracle_harness import DigestUnsupported, digest_compare


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_digest_matches_across_all_categories(spark, con):
    df = spark.sql(
        """
        SELECT * FROM VALUES
          (1, 'a', 1.25, CAST(12.30 AS DECIMAL(10,2)), true,
           DATE'2020-03-01', TIMESTAMP'2020-03-01 12:00:00.123456'),
          (2, NULL, CAST('nan' AS DOUBLE), NULL, false, NULL, NULL),
          (3, 'separator  inside', -0.000001, CAST(0.00 AS DECIMAL(10,2)),
           NULL, DATE'1969-12-31', TIMESTAMP'1970-01-01 00:00:00')
        AS t(i, s, f, dec, b, d, ts)
        """
    )
    sql = """
        SELECT * FROM (VALUES
          (CAST(1 AS BIGINT), 'a', 1.25, CAST(12.30 AS DECIMAL(10,2)), true,
           DATE '2020-03-01', TIMESTAMP '2020-03-01 12:00:00.123456'),
          (2, NULL, CAST('nan' AS DOUBLE), NULL, false, NULL, NULL),
          (3, 'separator  inside', -0.000001,
           CAST(0.00 AS DECIMAL(10,2)), NULL, DATE '1969-12-31',
           TIMESTAMP '1970-01-01 00:00:00'))
        AS t(i, s, f, dec, b, d, ts)
    """
    ok, msg = digest_compare(df, con, sql)
    assert ok, msg


def test_digest_is_order_insensitive(spark, con):
    df = spark.sql("SELECT id, id * 2 AS v FROM range(1000) ORDER BY id DESC")
    ok, msg = digest_compare(
        df, con, "SELECT range AS id, range * 2 AS v FROM range(1000)"
    )
    assert ok, msg


def test_digest_catches_single_cell_drift(spark, con):
    df = spark.sql("SELECT id, id * 2 AS v FROM range(1000)")
    ok, msg = digest_compare(
        df,
        con,
        "SELECT range AS id, CASE WHEN range = 500 THEN 999999 "
        "ELSE range * 2 END AS v FROM range(1000)",
    )
    assert not ok and "digest differs" in msg


def test_digest_catches_row_count_drift(spark, con):
    df = spark.sql("SELECT id FROM range(1000)")
    ok, msg = digest_compare(df, con, "SELECT range AS id FROM range(999)")
    assert not ok and "row count differs" in msg


def test_digest_catches_int_vs_float_category(spark, con):
    # the driver's hash distinguishes an int cell 13 from a float 13.0
    df = spark.sql("SELECT id, CAST(id AS BIGINT) AS v FROM range(10)")
    ok, msg = digest_compare(
        df, con, "SELECT range AS id, CAST(range AS DOUBLE) AS v FROM range(10)"
    )
    assert not ok and "type categories differ" in msg


def test_digest_float_grid_tolerates_sub_microdrift(spark, con):
    # values straddling ONE quantization grid (x.5e-6 boundaries for the
    # +0.25 grid at 1-ulp offsets) must still pass via the other grid
    df = spark.sql(
        "SELECT id, CAST(id AS DOUBLE) + 0.2500005 AS v FROM range(100)"
    )
    ok, msg = digest_compare(
        df,
        con,
        "SELECT range AS id, CAST(range AS DOUBLE) + 0.2500005 "
        "+ 1e-13 AS v FROM range(100)",
    )
    assert ok, msg


def test_digest_float_catches_real_drift(spark, con):
    df = spark.sql("SELECT id, CAST(id AS DOUBLE) / 7 AS v FROM range(1000)")
    ok, msg = digest_compare(
        df,
        con,
        "SELECT range AS id, CAST(range AS DOUBLE) / 7 + 0.001 AS v "
        "FROM range(1000)",
    )
    assert not ok and "BOTH offset grids" in msg


def test_digest_rejects_unsupported_categories(spark, con):
    df = spark.sql("SELECT id, array(id, id + 1) AS arr FROM range(5)")
    with pytest.raises(DigestUnsupported):
        digest_compare(
            df, con, "SELECT range AS id, [range, range + 1] AS arr FROM range(5)"
        )


def test_digest_empty_results_match(spark, con):
    df = spark.sql("SELECT id FROM range(10) WHERE id < 0")
    ok, msg = digest_compare(
        df, con, "SELECT range AS id FROM range(10) WHERE range < 0"
    )
    assert ok, msg
