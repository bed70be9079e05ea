"""PySpark-native analytics engine with the query and data-processing
capabilities of mokaya21/etl-bigquery-pipeline (see SURVEY.md).

The reference is a pandas/Airflow/BigQuery batch-ETL + data-quality engine
(/root/reference/dags/etl_pipeline.py). This package re-expresses every one
of its operators Spark-first — DataFrame/Spark SQL plans that Catalyst
optimizes — and extends the surface with large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns,
streaming event analytics) designed for 100 TB inputs.

Layout:
    session    — SparkSession factory (AQE, Arrow, UTC, tuned shuffle)
    sources    — readers (parquet/csv/json/excel) and sinks (parquet/warehouse)
    functions  — scalar/column helpers: coercion, text, vectors
    operators  — relational + LLM-pipeline operators (DataFrame -> DataFrame)
    plans      — DQ check framework and the end-to-end ETL pipeline
    streaming  — Structured Streaming variants of the event analytics
    multimodal — binary-column (image/audio) plumbing with stubbed decoders
"""

from etl_bigquery_pipeline_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
