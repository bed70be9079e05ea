"""SparkSession factory with scale-oriented defaults.

The reference has no session concept — each Airflow task is a fresh pandas
process and every stage round-trips through /tmp CSV
(/root/reference/dags/etl_pipeline.py:73-74, :117). Here one SparkSession
owns the whole lazy plan; these configs are the 100 TB posture applied
uniformly to the local[32] test harness:

- AQE on (runtime partition coalescing, skew-join splitting) — the knob that
  makes a fixed shuffle-partition count survive a 1000-executor scale-up.
- Arrow on — every pandas interop (Excel ingest, Pandas UDFs) is columnar.
- UTC session timezone — timestamp truncation/windowing is deterministic and
  matches naive-parquet semantics of external engines (DuckDB oracle).
- ANSI mode stays at the Spark 4 default (on); the reference's
  errors="coerce" semantics are provided per-expression with try_* functions
  (functions.coercion), not by flipping a global.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_session(
    app_name: str = "etl-bigquery-pipeline-spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when no cluster is
    configured; on a real cluster pass ``master=None`` with spark-submit
    owning the master URL.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Spark 4 rejects TIMESTAMP(NANOS) parquet outright; read as int64
        # nanos and normalize to microseconds in the reader (readers.py) —
        # the same floor-truncation DuckDB applies to ns parquet columns.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # 128 MiB input splits: big enough to amortize task overhead, small
        # enough that a 100 TB scan still yields ~800k tasks, not 8M.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Dimensions up to 64 MiB broadcast instead of shuffling the fact side.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # AQE's runtime broadcast DEMOTION threshold is deliberately lower
        # than the static one: runtime conversions are judged on COMPRESSED
        # shuffle bytes, and the driver-built HashedRelation expands those
        # 5-20x in heap (two-long rows compress extremely well). At 64 MiB
        # a "small" 60 MiB candidate-pair stage became a >1 GiB driver
        # build and killed minhash_near_dup_pairs at the 100x rehearsal
        # (sf10); 16 MiB caps the worst-case expansion near ~300 MiB.
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", str(16 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
