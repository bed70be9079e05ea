"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in etl_bigquery_pipeline_spark/plans/catalog.py;
this module is a thin adapter.
"""

from __future__ import annotations

import json
import pathlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_bigquery_pipeline_spark.plans import catalog

SF0001 = "/root/testdata/sf0.001"

_REPO = pathlib.Path(__file__).resolve().parent


def _driver_green() -> set[str]:
    """Names with a fully-green driver row in any recorded round.

    Reads every CORRECTNESS_r*.json in the repo root at import time, so
    the sample order can never go stale when a new round's file lands
    after the final commit (the r5/r6 handoff artifact — see
    VERDICT r6 'What's wrong #1').
    """
    green: set[str] = set()
    for path in sorted(_REPO.glob("CORRECTNESS_r*.json")):
        try:
            rows = json.loads(path.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(rows, dict):
            # a list/scalar record must not break driver import
            continue
        for name, row in rows.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                green.add(name)
    return green


def _sample_first() -> list[str]:
    """Oracled catalog queries with no green driver row yet, ordered
    newest-registration-first (the least-verified names burn sample
    slots first; rows-only queries are excluded — they have no
    oracle_sql entry and can never hash-green, the r04 failure mode).
    """
    green = _driver_green()
    # catalog._reorder_for_sweep already iterates newest-registered
    # first, so the uncovered names come out least-verified-first.
    return [
        name
        for name in catalog.QUERIES
        if name in catalog.ORACLE and name not in green
    ]


_SAMPLE_FIRST = _sample_first()


def _ordered(mapping: dict) -> dict:
    first = {k: mapping[k] for k in _SAMPLE_FIRST if k in mapping}
    rest = {k: v for k, v in mapping.items() if k not in first}
    return {**first, **rest}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return catalog.QUERIES["flagship_sales_rollup"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(catalog.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect equivalents for every oracle-checkable query."""
    return _ordered(catalog.ORACLE)
