"""Oracle-checked query catalog — the driver contract behind
__spark_entry__.py.

Every operator from SURVEY.md §2 (and the north-star tier) appears here as
a named query: a PySpark implementation (spark, sf_dir) -> DataFrame plus a
dialect-equivalent DuckDB SQL oracle over the same parquet tables. Naming
rule: every computed column is aliased identically on both sides (the
driver sorts columns by name before hashing).

Cross-engine determinism rules used throughout:
- SUM over doubles goes through DECIMAL(18,4) (exact, order-independent),
  then one cast to double — see functions.coercion.exact_sum.
- AVG and similarity scores are rounded (4 / 6 decimals): the residual
  engine difference is ~1e-12 relative, orders of magnitude below the
  rounding granularity.
- Ranks use row_number over a total order (rounded score desc, id asc).
- All hashes are md5-derived; MinHash minima compare fixed-width lowercase
  hex strings, never engine-specific integers.
- Timestamps stay at native microsecond precision; session gap logic uses
  interval comparisons (no second-truncation).

The dedup/near-dup queries plant mutated copies of real rows in-query
(UNION ALL with shifted ids) because the synthetic corpus has no natural
duplicates — detection is then visible in the result, and the oracle plants
the identical rows.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_bigquery_pipeline_spark.operators.caching import scoped_cache
from etl_bigquery_pipeline_spark.operators.localrel import literal_frame

from etl_bigquery_pipeline_spark.functions import text as TX
from etl_bigquery_pipeline_spark.functions.vectors import norm
from etl_bigquery_pipeline_spark.functions.coercion import (
    exact_sum,
    to_double_or_null,
)
from etl_bigquery_pipeline_spark.operators import (
    cleaning,
    dedup,
    layout,
    pq,
    quality_model,
    scd,
    schema_ops,
    sessionize,
    similarity,
    windows,
)
from etl_bigquery_pipeline_spark.operators.partitioning import widen_if_narrow
from etl_bigquery_pipeline_spark.plans import dq
from etl_bigquery_pipeline_spark.sources.readers import read_table

QueryFn = Callable[[SparkSession, str], DataFrame]
QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


