from etl_bigquery_pipeline_spark.operators import (
    cleaning,
    dedup,
    schema_ops,
    sessionize,
    similarity,
    windows,
)

__all__ = [
    "cleaning",
    "dedup",
    "schema_ops",
    "sessionize",
    "similarity",
    "windows",
]
