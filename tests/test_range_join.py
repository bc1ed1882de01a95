"""Bucketized range join: exact boundary semantics + equi-join plan."""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F

from python_etl_spark.operators.range_join import range_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_range_join_boundaries(spark):
    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00")),  # == start: included
            (2, _ts("2024-01-01 10:29:59.999999")),  # last us: included
            (3, _ts("2024-01-01 10:30:00")),  # == end: EXCLUDED
            (4, _ts("2024-01-01 09:59:59.999999")),  # before: excluded
            (5, _ts("2024-01-02 10:15:00")),  # other day
        ],
        "pid long, p_ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (100, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:30:00")),
            (200, _ts("2024-01-02 10:00:00"), _ts("2024-01-02 11:00:00")),
        ],
        "iid long, w_start timestamp, w_end timestamp",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in range_join(
            points, intervals, "p_ts", "w_start", "w_end", bucket_width_s=600
        ).collect()
    )
    assert got == [(1, 100), (2, 100), (5, 200)]


def test_range_join_interval_spanning_many_buckets(spark):
    # 3h interval with 5-minute buckets: 37 exploded rows, same answer
    points = spark.createDataFrame(
        [(i, _ts(f"2024-01-01 {h:02d}:30:00")) for i, h in enumerate(range(24))],
        "pid long, p_ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(1, _ts("2024-01-01 06:00:00"), _ts("2024-01-01 09:00:00"))],
        "iid long, w_start timestamp, w_end timestamp",
    )
    got = sorted(
        r.pid
        for r in range_join(
            points, intervals, "p_ts", "w_start", "w_end", bucket_width_s=300
        ).collect()
    )
    assert got == [6, 7, 8]


def test_empty_intervals_match_nothing(spark):
    """[t, t) contains no points and overlaps no interval — even when t
    sits exactly on a bucket boundary (where the unguarded explode
    would generate a descending 2-bucket sequence)."""
    from python_etl_spark.operators.range_join import interval_overlap_join

    points = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"))], "pid long, p_ts timestamp"
    )
    empty_on_boundary = spark.createDataFrame(
        [(9, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:00:00"))],
        "iid long, w_start timestamp, w_end timestamp",
    )
    assert (
        range_join(
            points, empty_on_boundary, "p_ts", "w_start", "w_end",
            bucket_width_s=600,
        ).count()
        == 0
    )
    enclosing = spark.createDataFrame(
        [(1, 5, _ts("2024-01-01 09:00:00"), _ts("2024-01-01 11:00:00"))],
        "k long, iid long, b_start timestamp, b_end timestamp",
    )
    empty_inside = spark.createDataFrame(
        [(1, 9, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:00:00"))],
        "k long, jid long, a_start timestamp, a_end timestamp",
    )
    assert (
        interval_overlap_join(
            empty_inside, enclosing, ["k"],
            "a_start", "a_end", "b_start", "b_end",
        ).count()
        == 0
    )


def test_range_join_plan_is_equi_join(spark):
    points = spark.range(10).select(
        F.col("id").alias("pid"),
        (F.lit(_ts("2024-01-01 00:00:00")) + F.make_interval(mins=F.col("id"))).alias("p_ts"),
    )
    intervals = spark.range(3).select(
        F.col("id").alias("iid"),
        (F.lit(_ts("2024-01-01 00:00:00")) + F.make_interval(hours=F.col("id"))).alias("w_start"),
        (F.lit(_ts("2024-01-01 00:00:00")) + F.make_interval(hours=F.col("id") + 1)).alias("w_end"),
    )
    j = range_join(points, intervals, "p_ts", "w_start", "w_end")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert j.count() == 10
