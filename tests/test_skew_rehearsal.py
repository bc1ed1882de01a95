"""Skew-join rehearsal (VERDICT r6 instruction #6): on a zipfian-head
replica (one orderkey carrying 24x |lineitem| rows, built by

    python scripts/make_scale_replica.py --skew /root/testdata/sf0.1 \
        .scratch/sf_skew 24

) assert that (a) AQE's OptimizeSkewedJoin actually SPLITS the hot
partition — `SortMergeJoin(skew=true)` + `AQEShuffleRead ... skewed`
visible in the finalized adaptive plan — and (b) the salted join beats
the unsalted sort-merge join when AQE is off (the manual fallback the
operator exists for). Measured calibration (quiet host, 2026-08-14):
plain 6.2s, salted 3.3-4.1s, AQE-skew-split 1.6-4.0s.

Skipped when the replica dir is absent or SPARK_GRAFT_SKIP_SCALING=1.
"""

from __future__ import annotations

import os
import time
from pathlib import Path

import pytest
from pyspark.sql import functions as F

SKEW_DIR = str(Path(__file__).resolve().parent.parent / ".scratch" / "sf_skew")

pytestmark = [
    pytest.mark.skipif(
        not os.path.isdir(SKEW_DIR),
        reason="skew replica absent — run scripts/make_scale_replica.py "
        "--skew /root/testdata/sf0.1 .scratch/sf_skew 24",
    ),
    pytest.mark.skipif(
        os.environ.get("SPARK_GRAFT_SKIP_SCALING") == "1",
        reason="SPARK_GRAFT_SKIP_SCALING=1",
    ),
]

_CONFS = {
    # low thresholds so the ~100 MB hot partition counts as skewed on a
    # local rehearsal (production defaults are 256 MB-scale); and no
    # broadcast, so the join is the sort-merge shape skew handling
    # targets
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8m",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def _frames(spark):
    li = spark.read.parquet(f"{SKEW_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    # narrow dim side (hot key + small tail): the realistic shape — a
    # huge skewed fact against a modest dimension
    orders = (
        spark.read.parquet(f"{SKEW_DIR}/orders.parquet")
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
        .where(F.col("l_orderkey") < 4000)
    )
    return li, orders


class _confs:
    def __init__(self, spark, extra):
        self.spark = spark
        self.confs = {**_CONFS, **extra}

    def __enter__(self):
        self.saved = {
            k: self.spark.conf.get(k, None) for k in self.confs
        }
        for k, v in self.confs.items():
            self.spark.conf.set(k, v)

    def __exit__(self, *exc):
        for k, v in self.saved.items():
            if v is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, v)


def _run_noop(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def test_aqe_skew_join_actually_splits(spark):
    """The finalized adaptive plan must carry the skew-split markers:
    SortMergeJoin(skew=true) fed by an AQEShuffleRead marked skewed."""
    li, orders = _frames(spark)
    with _confs(spark, {"spark.sql.adaptive.enabled": "true"}):
        df = li.join(orders, "l_orderkey")
        # run the DataFrame's OWN QueryExecution (count()/write() clone
        # the plan, leaving this one un-finalized)
        n = df._jdf.queryExecution().toRdd().count()
        plan = df._jdf.queryExecution().executedPlan().toString()
    assert n > 14_000_000  # hot key matched: 24x copies + tail
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, plan[:2000]
    assert "skewed" in plan  # AQEShuffleRead split the hot partition


def test_salted_join_beats_unsalted_without_aqe(spark):
    """With AQE off (the environment salting exists for), the salted
    plan must beat the single-hot-reducer sort-merge join. Min-of-two
    timings each to shed scheduler noise; result sizes must agree."""
    from python_etl_spark.operators.skew import salted_join

    li, orders = _frames(spark)
    with _confs(spark, {"spark.sql.adaptive.enabled": "false"}):
        plain_df = li.join(orders, "l_orderkey")
        salted_df = salted_join(li, orders, on="l_orderkey", salt_buckets=8)
        assert salted_df.count() == plain_df.count()
        _run_noop(plain_df)  # warmup (file listing, codegen)
        t_plain = min(_run_noop(plain_df) for _ in range(2))
        t_salted = min(_run_noop(salted_df) for _ in range(2))
    # calibrated ~0.55-0.65x; 0.85 leaves noise headroom while still
    # failing if salting ever degenerates to the unsalted shape
    assert t_salted < t_plain * 0.85, (t_salted, t_plain)


def test_aqe_skew_split_matches_salted_ballpark(spark):
    """AQE's automatic split should be at least as good as the plain
    unsalted join — the 'AQE makes manual salting optional' claim."""
    li, orders = _frames(spark)
    with _confs(spark, {"spark.sql.adaptive.enabled": "false"}):
        plain_df = li.join(orders, "l_orderkey")
        _run_noop(plain_df)
        t_plain = min(_run_noop(plain_df) for _ in range(2))
    with _confs(spark, {"spark.sql.adaptive.enabled": "true"}):
        aqe_df = li.join(orders, "l_orderkey")
        t_aqe = min(_run_noop(aqe_df) for _ in range(2))
    assert t_aqe < t_plain, (t_aqe, t_plain)
