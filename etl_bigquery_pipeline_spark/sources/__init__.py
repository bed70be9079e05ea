from etl_bigquery_pipeline_spark.sources.readers import (
    TESTDATA_TABLES,
    load_tables,
    read_csv,
    read_excel,
    read_json,
    read_table,
)
from etl_bigquery_pipeline_spark.sources.sinks import (
    ParquetWarehouse,
    WarehouseSink,
    write_parquet,
)

__all__ = [
    "TESTDATA_TABLES",
    "load_tables",
    "read_csv",
    "read_excel",
    "read_json",
    "read_table",
    "ParquetWarehouse",
    "WarehouseSink",
    "write_parquet",
]
