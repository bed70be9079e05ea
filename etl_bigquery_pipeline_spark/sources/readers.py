"""Source readers (SURVEY.md §2.1 S1-S4, S6).

The reference reads Excel with pandas/openpyxl
(/root/reference/dags/etl_pipeline.py:70), JSON arrays with pd.read_json
(:92) and re-reads its own /tmp CSV hand-offs with inferred types (:117,
:169, :227, :248). Spark-first mapping:

- Parquet is the primary format (columnar, predicate-pushdown, statistics).
- CSV/JSON are read with *explicit* schemas: schema inference is a full
  extra pass over 100 TB, and the reference's type-loss-per-stage problem
  (SURVEY.md §1.2) disappears when types are declared once at ingest.
- Excel has no distributed JVM reader in this environment, so it is a
  documented driver-bounded source: pandas reads the workbook, Arrow ships
  it to the JVM. Fine for config-sized workbooks; anything bigger should
  land as CSV/Parquet first.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Explicit schemas for the driver-provided test tables (TESTDATA.md); on a
# real deployment these would come from the catalog. Parquet carries its own
# schema so these double as documentation + assertion material.
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Columns stored as TIMESTAMP(NANOS) in parquet; Spark 4 can't read those
# natively, so the session reads them as int64 nanos
# (spark.sql.legacy.parquet.nanosAsLong) and this reader normalizes to
# microsecond timestamps — floor truncation, matching DuckDB's ns handling.
_NANOS_TS_COLUMNS = {"events": ("ts",)}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table from a scale-factor directory as parquet."""
    ns_cols = _NANOS_TS_COLUMNS.get(name, ())
    if ns_cols:
        # set defensively: the driver's session may not have it yet
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in ns_cols:
        if isinstance(df.schema[c].dataType, T.LongType):
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} DIV 1000)"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Load the named tables and register each as a temp view."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = read_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    *,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan (S4). Explicit schema preferred; inference only as fallback
    (it costs an extra full pass at scale)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    *,
    multi_line: bool = True,
    **options: str,
) -> DataFrame:
    """JSON scan (S2): array-of-records files need multiLine=true, one JSON
    object per line (JSONL — the scalable layout) sets multi_line=False."""
    reader = spark.read.option("multiLine", str(multi_line).lower())
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def read_excel(
    spark: SparkSession, path: str, sheet_name: int | str = 0
) -> DataFrame:
    """Excel scan (S1) — driver-bounded by design.

    The reference does pd.read_excel on one VM
    (/root/reference/dags/etl_pipeline.py:70); there is no scalable xlsx
    reader without an external package, so this reads on the driver and
    ships to executors via Arrow. Documented limit: workbook must fit in
    driver memory. Everything downstream is distributed.
    """
    import pandas as pd  # local import: openpyxl optional

    pdf = pd.read_excel(path, sheet_name=sheet_name)
    # Arrow conversion chokes on mixed object columns; stringify them.
    for col in pdf.columns:
        if pdf[col].dtype == object:
            pdf[col] = pdf[col].astype("string")
    return spark.createDataFrame(pdf)
