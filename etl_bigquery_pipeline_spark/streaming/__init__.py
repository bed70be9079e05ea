from etl_bigquery_pipeline_spark.streaming import events

__all__ = ["events"]
