"""Warehouse sinks (SURVEY.md §2.1 S5, S7).

The reference loads pandas frames into BigQuery with truncate-and-reload +
schema autodetect (/root/reference/dags/etl_pipeline.py:202-218) and creates
the dataset with a DDL call (:41-60). Spark-first mapping: a small sink
interface with two implementations —

- ParquetWarehouse: the test-environment warehouse; overwrite-mode parquet
  (or saveAsTable) gives the same truncate-reload semantics with a columnar,
  statistics-bearing format instead of a network round-trip.
- BigQueryWarehouse: the production path via the public spark-bigquery
  connector (`df.write.format("bigquery")`); constructed lazily so the repo
  never needs the connector jar or network in tests.

Unlike the reference there is no schema "autodetect" step: a Spark
DataFrame is always typed, so the warehouse schema is the plan's schema.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Truncate-and-reload parquet sink (S5 semantics).

    ``partition_by`` is the 100 TB lever: partitioning the output by the
    dominant filter column (e.g. a date) lets every downstream scan prune
    whole directories.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


class WarehouseSink:
    """Interface: truncate-reload a table + read it back for validation."""

    def create_namespace(self, name: str) -> None:  # S7
        raise NotImplementedError

    def overwrite(self, df: DataFrame, table: str) -> None:  # S5
        raise NotImplementedError

    def read(self, spark: SparkSession, table: str) -> DataFrame:  # S6
        raise NotImplementedError


@dataclass
class ParquetWarehouse(WarehouseSink):
    """Filesystem-backed warehouse used by tests and local pipelines."""

    root: str

    def _path(self, table: str) -> str:
        return os.path.join(self.root, *table.split("."))

    def create_namespace(self, name: str) -> None:
        os.makedirs(os.path.join(self.root, name), exist_ok=True)

    def overwrite(self, df: DataFrame, table: str) -> None:
        write_parquet(df, self._path(table), mode="overwrite")

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.parquet(self._path(table))

    def upsert(self, updates: DataFrame, table: str, keys: list[str]) -> None:
        """Merge-by-rewrite upsert: rows matching an update key are
        replaced, new keys are inserted (MERGE WHEN MATCHED UPDATE /
        NOT MATCHED INSERT over a format without transaction logs).

        Plan: target LEFT ANTI updates on the keys (drop stale versions)
        UNION the updates, write to a staging path, atomically swap
        directories. At warehouse scale this is the compaction-style
        merge every rewrite-based lakehouse runs under the hood; a real
        deployment partitions the table and rewrites only partitions
        containing update keys (partition_by in write_parquet + a key →
        partition pruning filter). The anti join broadcasts the update
        side when small — the common CDC-batch case.
        """
        import shutil

        path = self._path(table)
        spark = updates.sparkSession
        if not os.path.exists(path):
            write_parquet(updates, path, mode="overwrite")
            return
        target = spark.read.parquet(path)
        merged = target.join(updates, keys, "left_anti").unionByName(updates)
        staging = path + ".__staging"
        write_parquet(merged, staging, mode="overwrite")
        old = path + ".__old"
        os.rename(path, old)
        os.rename(staging, path)
        shutil.rmtree(old)


@dataclass
class BigQueryWarehouse(WarehouseSink):
    """Production warehouse via the open-source spark-bigquery connector.

    Mirrors the reference's WRITE_TRUNCATE + dataset-create-if-absent
    behavior (/root/reference/dags/etl_pipeline.py:54, :209). Requires the
    connector package on the cluster classpath
    (com.google.cloud.spark:spark-bigquery-with-dependencies); untestable in
    this offline environment, exercised only through this narrow interface.
    """

    project: str
    dataset: str
    location: str = "us-central1"

    def create_namespace(self, name: str) -> None:
        from google.cloud import bigquery  # pragma: no cover - needs network

        client = bigquery.Client(project=self.project)  # pragma: no cover
        ds = bigquery.Dataset(f"{self.project}.{name}")  # pragma: no cover
        ds.location = self.location  # pragma: no cover
        client.create_dataset(ds, exists_ok=True)  # pragma: no cover

    def overwrite(self, df: DataFrame, table: str) -> None:  # pragma: no cover
        (
            df.write.format("bigquery")
            .option("table", f"{self.project}.{self.dataset}.{table}")
            .option("writeMethod", "indirect")
            .mode("overwrite")
            .save()
        )

    def read(self, spark: SparkSession, table: str) -> DataFrame:  # pragma: no cover
        return (
            spark.read.format("bigquery")
            .option("table", f"{self.project}.{self.dataset}.{table}")
            .load()
        )
