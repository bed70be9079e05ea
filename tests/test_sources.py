"""Source/sink tests: CSV/JSON explicit-schema ingest, parquet warehouse
round-trip, Excel (gated: openpyxl absent in this environment)."""

from __future__ import annotations

import importlib.util
import json

import pytest

from etl_bigquery_pipeline_spark.sources import readers, sinks

HAS_OPENPYXL = importlib.util.find_spec("openpyxl") is not None


def test_read_csv_explicit_schema(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    df = readers.read_csv(spark, str(p), schema="a bigint, b string")
    assert df.schema.simpleString() == "struct<a:bigint,b:string>"
    assert df.count() == 2


def test_read_json_multiline_array(spark, tmp_path):
    p = tmp_path / "in.json"
    p.write_text(json.dumps([{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]))
    df = readers.read_json(spark, str(p), schema="id bigint, v string")
    assert sorted(r.id for r in df.collect()) == [1, 2]


def test_read_jsonl(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text('{"id": 1}\n{"id": 2}\n{"id": 3}\n')
    df = readers.read_json(spark, str(p), schema="id bigint", multi_line=False)
    assert df.count() == 3


def test_parquet_warehouse_roundtrip(spark, tmp_path):
    wh = sinks.ParquetWarehouse(str(tmp_path))
    wh.create_namespace("ns")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
    wh.overwrite(df, "ns.t")
    back = wh.read(spark, "ns.t")
    assert sorted(r.id for r in back.collect()) == [1, 2]
    # truncate-reload semantics: second overwrite replaces, not appends
    wh.overwrite(df.limit(1), "ns.t")
    assert wh.read(spark, "ns.t").count() == 1


def test_write_parquet_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "2024-01"), (2, "2024-02")], "id bigint, month string"
    )
    out = str(tmp_path / "part")
    sinks.write_parquet(df, out, partition_by=("month",))
    import os

    assert sorted(
        d for d in os.listdir(out) if d.startswith("month=")
    ) == ["month=2024-01", "month=2024-02"]
    # partition pruning: reading one partition only
    one = spark.read.parquet(out).filter("month = '2024-01'")
    assert one.count() == 1


@pytest.mark.skipif(not HAS_OPENPYXL, reason="openpyxl not installed")
def test_read_excel_driver_side(spark, tmp_path):  # pragma: no cover
    import pandas as pd

    p = tmp_path / "in.xlsx"
    pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}).to_excel(p, index=False)
    df = readers.read_excel(spark, str(p))
    assert df.count() == 2


def test_load_tables_registers_views(spark, sf_dir):
    out = readers.load_tables(spark, sf_dir, ("region", "nation"))
    assert set(out) == {"region", "nation"}
    assert spark.sql("SELECT COUNT(*) c FROM region").first().c == 5
