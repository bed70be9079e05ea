"""Local replica of the driver's t2 correctness gate.

Runs every catalog query on Spark and its oracle on DuckDB over the same
parquet directory, then compares row count, column names, and an
order-insensitive value representation. Used by tests/test_oracle_parity.py
so oracle drift is caught before the driver ever sees it.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from etl_bigquery_pipeline_spark.sources.readers import TESTDATA_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v: Any) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, (int, bool, str)):
        return str(v)
    return str(v)  # timestamps/dates/decimals -> str form


def canonicalize(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, then rows — mirrors the driver's
    order-insensitive hash."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    shaped = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(shaped)


def compare(
    spark_df, con: duckdb.DuckDBPyConnection, sql: str
) -> tuple[bool, str]:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = rel.columns
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count differs: spark={len(s_rows)} duck={len(d_rows)}"
    cs = canonicalize(s_cols, s_rows)
    cd = canonicalize(d_cols, d_rows)
    if cs != cd:
        diffs = [
            f"  spark={a}\n   duck={b}" for a, b in zip(cs, cd) if a != b
        ][:5]
        return False, "values differ (first diffs):\n" + "\n".join(diffs)
    return True, f"ok ({len(s_rows)} rows)"
