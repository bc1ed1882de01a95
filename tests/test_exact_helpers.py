"""Adversarial fixtures for the midpoint-free rounding helpers: means
and ratios that land EXACTLY on 6-decimal midpoints must round
half-away-from-zero to the same double in Spark and DuckDB."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from python_etl_spark.functions.exact import (
    dmean,
    dmean_sql,
    dround_div,
    dround_div_sql,
)


def test_dmean_matches_sql_twin_on_midpoints(spark):
    rows = [
        (1, 0.000001), (1, 0.000444),      # mean exactly 0.0002225
        (2, -0.000001), (2, -0.000444),    # negative twin
        (3, 0.013005), (3, 0.0),           # the dsir bug shape (S/2)
        (4, 1.0), (4, 2.0), (4, 0.0000035),
    ]
    df = spark.createDataFrame(rows, "g int, v double")
    got = {r.g: r.m for r in df.groupBy("g").agg(dmean("v").alias("m")).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({g},{v})" for g, v in rows)
        + ") AS t(g,v)"
    )
    want = dict(con.execute(f"SELECT g, {dmean_sql('v')} FROM t GROUP BY g").fetchall())
    assert got == want
    # half-away-from-zero on both signs, not round-half-even
    assert got[1] == 0.000223 and got[2] == -0.000223
    assert got[3] == 0.006503


def test_dround_div_matches_sql_twin_on_midpoints(spark):
    rows = [
        (0.000003, 2.0),     # exactly 0.0000015 -> 0.000002 (half up)
        (-0.000003, 2.0),    # -> -0.000002 (half away from zero)
        (0.000003, -2.0),
        (1.25, 1000000.0),
        (7.5, 3.0),
        (100.0, 7.0),
        (-22.47, 13.11),
    ]
    df = spark.createDataFrame(rows, "p double, q double")
    got = [r.r for r in df.select(dround_div("p", "q").alias("r")).collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({p},{q})" for p, q in rows)
        + ") AS t(p,q)"
    )
    want = [r[0] for r in con.execute(f"SELECT {dround_div_sql('p','q')} FROM t").fetchall()]
    assert got == want
    assert got[0] == 0.000002 and got[1] == -0.000002 and got[2] == -0.000002


def test_dround_div_null_propagation(spark):
    df = spark.createDataFrame([(None, 2.0), (1.0, None)], "p double, q double")
    out = [r.r for r in df.select(dround_div("p", "q").alias("r")).collect()]
    assert out == [None, None]  # LAG-style leading nulls stay null
