from etl_bigquery_pipeline_spark.streaming import events, incremental

__all__ = ["events", "incremental"]
