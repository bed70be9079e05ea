from etl_bigquery_pipeline_spark.streaming import events, incremental, stateful

__all__ = ["events", "incremental", "stateful"]
