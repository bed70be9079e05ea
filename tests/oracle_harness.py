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


_SPARK_INT = {"tinyint", "smallint", "int", "bigint", "long", "integer"}
_DUCK_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}


def _spark_type_category(dtype: str) -> str:
    d = dtype.lower()
    if d in _SPARK_INT:
        return "int"
    if d in ("float", "double"):
        return "float"
    if d.startswith("decimal"):
        return "decimal"
    if d == "boolean":
        return "bool"
    if d in ("string", "varchar"):
        return "str"
    if d == "date":
        return "date"
    if d.startswith("timestamp"):
        return "ts"
    return "other"


def _duck_type_category(t: Any) -> str:
    d = str(t).upper()
    if d in _DUCK_INT:
        return "int"
    if d in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if d.startswith("DECIMAL"):
        return "decimal"
    if d == "BOOLEAN":
        return "bool"
    if d in ("VARCHAR", "TEXT", "STRING"):
        return "str"
    if d == "DATE":
        return "date"
    if d.startswith("TIMESTAMP"):
        return "ts"
    return "other"


def type_mismatches(spark_df, rel) -> list[str]:
    """Per-column type-CATEGORY diff between a Spark DataFrame and a DuckDB
    relation (schema-only — neither side executes).

    The driver's value hash is type-sensitive in a way the %.10g cell
    normalization below is not: an int cell `13` and a float cell `13.0`
    both render "13" here but hash differently there (round-5 driver red
    on clamped_running_inventory: Spark BIGINT vs oracle DOUBLE, values
    identical). Categories (int/float/decimal/bool/str/date/ts) mirror
    how Python cell types differ after collect/fetchall, which is what
    the driver's pandas-based hash actually sees."""
    s_cats = {n: _spark_type_category(t) for n, t in spark_df.dtypes}
    d_cats = {
        n: _duck_type_category(t) for n, t in zip(rel.columns, rel.types)
    }
    return [
        f"{n}: spark={s_cats[n]} duck={d_cats[n]}"
        for n in s_cats
        if n in d_cats and s_cats[n] != d_cats[n]
    ]


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
    tmis = type_mismatches(spark_df, rel)
    if tmis:
        return False, "type categories differ (driver hash distinguishes " \
            "these even when %.10g-rendered values agree): " + "; ".join(tmis)
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
