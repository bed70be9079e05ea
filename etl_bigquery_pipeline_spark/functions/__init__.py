from etl_bigquery_pipeline_spark.functions import coercion, text, vectors

__all__ = ["coercion", "text", "vectors"]
