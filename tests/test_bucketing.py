"""Bucketed tables: the shuffle-once-at-ingest join strategy.

Writes orders and lineitem bucketed on the join key, then asserts the
join plan contains NO Exchange — the bucketing metadata satisfies the
join's distribution requirement on both sides.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from python_etl_spark.sinks.writers import write_bucketed
from python_etl_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(
        orders, "b_orders", 8, ["o_orderkey"], sort_cols=["o_orderkey"],
        path=str(base / "b_orders"),
    )
    write_bucketed(
        li, "b_lineitem", 8, ["l_orderkey"], sort_cols=["l_orderkey"],
        path=str(base / "b_lineitem"),
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_is_shuffle_free(spark, sf_dir, bucketed_tables):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and it computes the same join as the unbucketed path
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        want = orders.join(
            li, F.col("o_orderkey") == F.col("l_orderkey")
        ).count()
        assert j.count() == want
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_agg_is_shuffle_free(spark, bucketed_tables):
    agg = spark.table("b_lineitem").groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() > 0


def test_zorder_layout_tightens_file_bounding_boxes(spark, tmp_path):
    """Z-order clustering must shrink per-file (partkey, suppkey)
    bounding boxes vs the unsorted layout: the sum over files of
    (range_a * range_b) — the area a point predicate can hit — should
    drop by a large factor, which is exactly what makes min/max file
    skipping work on BOTH columns."""
    from pyspark.sql import functions as F

    from python_etl_spark.operators.layout import zorder_by

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )

    base = str(tmp_path / "plain")
    li.repartition(8).write.mode("overwrite").parquet(base)
    zdir = str(tmp_path / "zorder")
    zorder_by(li, "l_partkey", "l_suppkey", n_files=8).write.mode(
        "overwrite"
    ).parquet(zdir)

    def area(path):
        df = spark.read.parquet(path)
        per_file = (
            df.withColumn("f", F.input_file_name())
            .groupBy("f")
            .agg(
                (F.max("l_partkey") - F.min("l_partkey")).alias("ra"),
                (F.max("l_suppkey") - F.min("l_suppkey")).alias("rb"),
            )
            .collect()
        )
        return sum((r.ra + 1) * (r.rb + 1) for r in per_file)

    plain, z = area(base), area(zdir)
    assert spark.read.parquet(zdir).count() == li.count()  # lossless
    assert z < plain / 3, (z, plain)  # >=3x tighter boxes
