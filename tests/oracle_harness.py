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


class DigestUnsupported(Exception):
    """Raised when a result schema has a column category the engine-side
    digest can't canonicalize identically in both engines (arrays, maps,
    structs — their string forms diverge between Spark and DuckDB)."""


_SEP = "\x1f"
_NULL = "∅"
_LANES = 4  # four 8-hex (32-bit) md5 slices; sums fit BIGINT at any sf


def _spark_canon(col_name: str, dtype: str, grid: float):
    """Canonical-string expression for one Spark column. Must produce the
    exact same string DuckDB's `_duck_canon` produces for the same logical
    value — both engines then md5 the concatenated row form. ``grid`` is
    the float-quantization offset (see digest_compare: two offset grids
    make the digest robust to 1-ulp cross-engine libm differences)."""
    from pyspark.sql import functions as F

    c = F.col(col_name)
    cat = _spark_type_category(dtype)
    if cat == "int":
        return c.cast("string")
    if cat == "bool":
        return F.when(c.isNull(), F.lit(None)).when(c, "1").otherwise("0")
    if cat == "float":
        # quantize to 1e-6 via IEEE-identical double ops (both engines
        # hold near-bit-identical doubles for per-row-deterministic
        # outputs, the digest-mode contract); |x|>9e11 would overflow
        # the scaled BIGINT, so huge/inf collapse to signed sentinels
        return (
            F.when(F.isnan(c), F.lit("nan"))
            .when(c > 9e11, F.lit("big+"))
            .when(c < -9e11, F.lit("big-"))
            .otherwise(
                F.floor(c * F.lit(1e6) + F.lit(grid))
                .cast("bigint")
                .cast("string")
            )
        )
    if cat == "decimal":
        return c.cast("string")
    if cat == "date":
        return F.datediff(c, F.to_date(F.lit("1970-01-01"))).cast("string")
    if cat == "ts":
        return F.unix_micros(c).cast("string")
    if cat == "str":
        return c
    raise DigestUnsupported(f"{col_name}: {dtype}")


def _duck_canon(col_name: str, duck_type, grid: float) -> str:
    q = f'"{col_name}"'
    cat = _duck_type_category(duck_type)
    if cat == "int":
        return f"CAST({q} AS VARCHAR)"
    if cat == "bool":
        return (
            f"CASE WHEN {q} IS NULL THEN NULL "
            f"WHEN {q} THEN '1' ELSE '0' END"
        )
    if cat == "float":
        return (
            f"CASE WHEN isnan({q}) THEN 'nan' "
            f"WHEN {q} > 9e11 THEN 'big+' "
            f"WHEN {q} < -9e11 THEN 'big-' "
            f"ELSE CAST(CAST(floor({q} * 1e6 + {grid!r}) AS BIGINT)"
            f" AS VARCHAR) END"
        )
    if cat == "decimal":
        return f"CAST({q} AS VARCHAR)"
    if cat == "date":
        return f"CAST({q} - DATE '1970-01-01' AS VARCHAR)"
    if cat == "ts":
        return f"CAST(epoch_us({q}) AS VARCHAR)"
    if cat == "str":
        return q
    raise DigestUnsupported(f"{col_name}: {duck_type}")


def digest_compare(
    spark_df, con: duckdb.DuckDBPyConnection, sql: str
) -> tuple[bool, str]:
    """Order-insensitive ENGINE-SIDE comparison with O(1) output.

    Each engine canonicalizes every cell to a shared string form
    (ints/decimals/strings verbatim, floats quantized to 1e-6 via
    IEEE-identical ops, dates as epoch days, timestamps as epoch
    micros), md5s the '\\x1f'-joined row (columns in sorted-name
    order), and aggregates COUNT(*) plus four 32-bit md5-lane SUMs.
    Only those 5 numbers cross the engine boundary, so a 60M-row
    full-output query compares in aggregate time instead of collect +
    Python-canonicalize time.

    Contract: sound only for PER-ROW-DETERMINISTIC outputs (projections,
    joins, exact or pre-rounded arithmetic). Floats are quantized to
    1e-6 on TWO offset grids (+0.25 and +0.75): a 1-ulp cross-engine
    libm difference (e.g. Java Math.log vs C std::log) can straddle a
    boundary of at most ONE grid, while a real drift >= 1e-6 lands in
    different buckets on BOTH — so pass = row count matches AND either
    grid's lane sums match. Parallel float AGGREGATIONS whose cross-
    engine results differ by more than an ulp stay on the %.10g full
    comparison.

    Schema names and type CATEGORIES are still checked exactly (the
    driver's hash distinguishes int from float cells); an unsupported
    category (array/map/struct) raises DigestUnsupported — fall back to
    compare().
    """
    from pyspark.sql import functions as F

    s_cols = spark_df.columns
    rel = con.sql(sql)
    d_cols = rel.columns
    if sorted(s_cols) != sorted(d_cols):
        return False, (
            f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}"
        )
    tmis = type_mismatches(spark_df, rel)
    if tmis:
        return False, "type categories differ (driver hash distinguishes " \
            "these even when %.10g-rendered values agree): " + "; ".join(tmis)

    order = sorted(s_cols)
    s_types = dict(spark_df.dtypes)
    d_types = dict(zip(rel.columns, rel.types))
    grids = (0.25, 0.75)

    # -- Spark digest: ONE aggregate job, 1 + 2*4 numbers to the driver
    aggs = [F.count(F.lit(1)).alias("n")]
    lane_cols = []
    for gi, grid in enumerate(grids):
        canon = [
            F.coalesce(_spark_canon(n, s_types[n], grid), F.lit(_NULL))
            for n in order
        ]
        m = F.md5(F.concat_ws(_SEP, *canon))
        for k in range(_LANES):
            lane_cols.append(
                F.conv(F.substring(m, 1 + 8 * k, 8), 16, 10)
                .cast("long")
                .alias(f"__g{gi}l{k}")
            )
            aggs.append(F.sum(f"__g{gi}l{k}").alias(f"g{gi}s{k}"))
    srow = tuple(spark_df.select(*lane_cols).agg(*aggs).collect()[0])

    # -- DuckDB digest: wrap the oracle SQL, aggregate in-engine
    hash_cols, sum_cols = [], []
    for gi, grid in enumerate(grids):
        d_canon = ", ".join(
            f"coalesce({_duck_canon(n, d_types[n], grid)}, '{_NULL}')"
            for n in order
        )
        hash_cols.append(
            f"md5(concat_ws('{_SEP}', {d_canon})) AS __m{gi}"
        )
        for k in range(_LANES):
            sum_cols.append(
                f"CAST(SUM(('0x' || substr(__m{gi}, {1 + 8 * k}, 8))::BIGINT)"
                f" AS BIGINT) AS g{gi}s{k}"
            )
    wrapped = (
        f"WITH __q AS ({sql}), "
        f"__h AS (SELECT {', '.join(hash_cols)} FROM __q) "
        f"SELECT CAST(COUNT(*) AS BIGINT) AS n, {', '.join(sum_cols)} "
        f"FROM __h"
    )
    drow = tuple(con.sql(wrapped).fetchall()[0])

    if srow[0] != drow[0]:
        return False, f"row count differs: spark={srow[0]} duck={drow[0]}"
    g0_ok = srow[1 : 1 + _LANES] == drow[1 : 1 + _LANES]
    g1_ok = srow[1 + _LANES :] == drow[1 + _LANES :]
    if not (g0_ok or g1_ok):
        return False, (
            f"digest differs on BOTH offset grids (n + 4 md5-lane sums "
            f"each): spark={srow} duck={drow}"
        )
    note = "" if (g0_ok and g1_ok) else (
        " [one grid straddled a float-quantization boundary — "
        "sub-1e-6 cross-engine float noise, not drift]"
    )
    return True, f"digest ok ({srow[0]} rows, 2x4 lanes){note}"


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
