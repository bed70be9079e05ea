from etl_bigquery_pipeline_spark.streaming import (
    events,
    incremental,
    stateful,
    tws,
)

__all__ = ["events", "incremental", "stateful", "tws"]
