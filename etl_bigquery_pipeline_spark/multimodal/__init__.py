from etl_bigquery_pipeline_spark.multimodal import binary_ops

__all__ = ["binary_ops"]
