"""The reference's end-to-end ETL pipeline, re-expressed Spark-first.

Reference flow (/root/reference/dags/etl_pipeline.py:534-543): 8 Airflow
tasks — create dataset, extract {excel, json} in parallel branches,
transform each (schema-fix, coerce, clean), truncate-load into BigQuery,
then a 9-query validation stage that hard-fails on critical violations.
Every stage hop materializes /tmp CSV and re-infers types.

Spark mapping: the whole DAG is two lazy DataFrame lineages in one
SparkSession. There are no intermediate files (the lazy plan replaces the
CSV hand-off), no type re-inference (schemas persist end-to-end), no XCom
(plain return values). The only actions are the two sink writes and the DQ
aggregate scans — at 100 TB the pipeline is two scans + two writes + one
DQ pass per table.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from etl_bigquery_pipeline_spark.operators import cleaning, schema_ops
from etl_bigquery_pipeline_spark.plans import dq
from etl_bigquery_pipeline_spark.sources.sinks import WarehouseSink

SALES_COLUMNS = ["date", "store_id", "product_id", "units_sold", "sales_amount"]
SALES_TYPES = {
    "date": "timestamp",
    "units_sold": "bigint",
    "sales_amount": "double",
}
PRODUCT_TYPES = {"price": "double"}


def transform_sales(raw: DataFrame) -> DataFrame:
    """The reference's transform_excel_data (:110-160) as one lazy plan:
    impose schema (sniff/split/rename), coerce-to-null, drop null rows."""
    shaped = schema_ops.impose_schema(raw, SALES_COLUMNS)
    cleaned, _ = cleaning.clean(shaped, SALES_TYPES)
    return cleaned


def transform_products(raw: DataFrame) -> DataFrame:
    """transform_json_data (:162-198): coerce price, drop nulls, full-row
    dedup."""
    cleaned, _ = cleaning.clean(
        raw.select("product_id", "product_name", "price"), PRODUCT_TYPES
    )
    return cleaned


@dataclass
class PipelineResult:
    sales_rows: int
    product_rows: int
    dq_results: list[dq.CheckResult]
    report: DataFrame


def run_pipeline(
    spark: SparkSession,
    sales_raw: DataFrame,
    products_raw: DataFrame,
    sink: WarehouseSink,
    *,
    namespace: str = "sales_analytics",
    enforce_critical: bool = True,
) -> PipelineResult:
    """extract -> transform -> load -> validate, matching the reference's
    task graph (:534-543) minus the orchestration machinery."""
    sink.create_namespace(namespace)

    sales = transform_sales(sales_raw)
    products = transform_products(products_raw)

    sales_n = sales.count()
    products_n = products.count()
    sink.overwrite(sales, f"{namespace}.store_sales")
    sink.overwrite(products, f"{namespace}.products")

    # Validation reads the *written* tables, like the reference validating
    # warehouse state rather than in-flight frames (:261-473).
    w_sales = sink.read(spark, f"{namespace}.store_sales")
    w_products = sink.read(spark, f"{namespace}.products")

    results: list[dq.CheckResult] = []
    results += dq.TableChecks(
        table="store_sales",
        df=w_sales,
        scalar=[
            dq.row_count_check(),
            dq.parity_check(sales_n),
            dq.null_check(["date", "product_id", "units_sold", "sales_amount"]),
            dq.range_check("sales_amount", min_allowed=0.0),
            dq.range_check("units_sold", min_allowed=0),
        ],
        duplicate_keys=[["product_id", "date"]],
    ).run()
    results += dq.TableChecks(
        table="products",
        df=w_products,
        scalar=[
            dq.row_count_check(),
            dq.parity_check(products_n),
            dq.null_check(["product_id", "product_name", "price"]),
            dq.range_check("price", min_allowed=0.0, strict_min=True),
        ],
        duplicate_keys=[["product_id"]],
    ).run()
    results.append(
        dq.referential_integrity_check(
            w_sales, w_products, "product_id", fact_name="store_sales"
        )
    )

    report = dq.report_df(spark, results)
    if enforce_critical:
        dq.enforce(results)
    return PipelineResult(sales_n, products_n, results, report)
