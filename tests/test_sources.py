"""Source/sink layer tests."""

from __future__ import annotations

import os

import pytest

from keenwa_spark.errors import ArgumentError
from keenwa_spark.sources import read_csv, read_json, read_parquet, write_parquet
from keenwa_spark.sources.readers import read_table_dir

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.001")


def test_parquet_roundtrip_partitioned(spark, tmp_path):
    src = read_table_dir(spark, SF_DIR, "orders")
    out = str(tmp_path / "orders_by_status")
    write_parquet(src, out, partition_by=["o_orderstatus"], mode="overwrite")
    back = read_parquet(spark, out)
    assert back.count() == src.count()
    # partition dirs exist -> partition pruning is available
    assert any(d.startswith("o_orderstatus=") for d in os.listdir(out))
    # pruned read touches one partition only
    pruned = read_parquet(spark, out).filter("o_orderstatus = 'F'")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "o_orderstatus" in plan


def test_parquet_column_pruning_param(spark):
    df = read_table_dir(spark, SF_DIR, "lineitem", columns=["l_orderkey", "l_quantity"])
    assert df.columns == ["l_orderkey", "l_quantity"]


def test_csv_json_roundtrip(spark, tmp_path):
    src = read_table_dir(spark, SF_DIR, "nation")
    csv_path, json_path = str(tmp_path / "n.csv"), str(tmp_path / "n.json")
    src.write.option("header", "true").csv(csv_path)
    src.write.json(json_path)
    csv_back = read_csv(
        spark, csv_path, schema="n_nationkey INT, n_name STRING, n_regionkey INT"
    )
    json_back = read_json(
        spark, json_path, schema="n_nationkey INT, n_name STRING, n_regionkey INT"
    )
    assert csv_back.count() == 25
    assert json_back.count() == 25
    assert {r.n_name for r in csv_back.collect()} == {r.n_name for r in json_back.collect()}


def test_missing_table_raises(spark):
    with pytest.raises(ArgumentError):
        read_table_dir(spark, SF_DIR, "no_such_table")


def test_write_sizing_produces_multiple_files(spark, tmp_path):
    src = read_table_dir(spark, SF_DIR, "lineitem")
    out = str(tmp_path / "sized")
    write_parquet(src, out, est_bytes=4 * (256 << 20), mode="overwrite")
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == 4
