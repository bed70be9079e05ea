from etl_bigquery_pipeline_spark.plans import dq, pipeline

__all__ = ["dq", "pipeline"]
