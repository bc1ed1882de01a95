"""Versioned-table sink: atomic manifest commits, MERGE round-trip
equal to the logical upsert, time travel, delete, vacuum."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_etl_spark.plans import QUERIES
from python_etl_spark.sinks.table import VersionedTable
from python_etl_spark.sources.tables import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_round_trip_equals_logical_upsert(spark, sf_dir, tmp_path):
    """base + changelog -> merged table -> re-read equals the
    etl_upsert_merge query output (the driver-oracle-checked MERGE)."""
    orders = load_table(spark, sf_dir, "orders")
    t = VersionedTable(str(tmp_path / "orders_t"))
    t.create(orders)
    updates = orders.where(F.col("o_orderstatus") == "P").withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    t.merge(updates, keys=["o_orderkey"])
    want = QUERIES["etl_upsert_merge"](spark, sf_dir)
    got = t.read(spark).select(*want.columns)
    assert _rows(got) == _rows(want)


def test_append_and_time_travel(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    a = spark.createDataFrame([(1, "a")], "k long, v string")
    b = spark.createDataFrame([(2, "b")], "k long, v string")
    assert not t.exists()
    assert t.create(a) == 0
    assert t.append(b) == 1
    assert _rows(t.read(spark)) == [(1, "a"), (2, "b")]
    assert _rows(t.read(spark, version=0)) == [(1, "a")]  # time travel
    ops = [m["op"] for m in t.history()]
    assert ops == ["create", "append"]
    with pytest.raises(RuntimeError, match="already exists"):
        t.create(a)


def test_merge_inserts_and_updates(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "old"), (2, "keep")], "k long, v string"))
    t.merge(
        spark.createDataFrame([(1, "new"), (3, "ins")], "k long, v string"),
        keys=["k"],
    )
    assert _rows(t.read(spark)) == [(1, "new"), (2, "keep"), (3, "ins")]
    # merge manifest lists only the rewritten dir (copy-on-write)
    assert len(t.history()[-1]["data_dirs"]) == 1


def test_delete_where_and_vacuum(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.create(
        spark.createDataFrame([(i, i % 2) for i in range(10)], "k long, odd int")
    )
    t.delete_where(F.col("odd") == 1)
    assert t.read(spark).count() == 5
    assert t.read(spark, version=0).count() == 10
    removed = t.vacuum()
    assert len(removed) == 1  # the v0 dir is unreachable from latest
    assert t.read(spark).count() == 5  # latest still intact
    with pytest.raises(Exception):
        t.read(spark, version=0).count()  # time travel gone after vacuum
