from __future__ import annotations

import os

import pytest

# must run before any SparkSession exists: workers inherit PYTHONPATH at
# JVM launch (see tests/proto_compat.py — protobuf shim for the TWS test)
from tests.proto_compat import ensure_protobuf

ensure_protobuf()

# The whole suite runs with strict cache ownership: an operator calling
# scoped_cache outside a cache_scope raises (operators/caching.py) instead
# of silently parking the cache in the LRU registry. The autouse fixture
# below gives every test its own scope, so caches release per-test.
os.environ.setdefault("SPARK_GRAFT_STRICT_CACHE_SCOPE", "1")

from etl_bigquery_pipeline_spark.operators.caching import cache_scope
from etl_bigquery_pipeline_spark.session import get_session

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(autouse=True)
def _test_cache_scope():
    with cache_scope():
        yield


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = tmp_path_factory.mktemp("spark-warehouse")
    s = get_session(
        "pytest",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": str(wh)},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF0001
