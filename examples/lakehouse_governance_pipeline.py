#!/usr/bin/env python
"""Governed lakehouse lifecycle (the round-11 part-2 family):

1. CREATE a constrained orders table (CHECK constraints validated on
   the initial load; SQL semantics — NULL passes, FALSE refuses).
2. Land a nightly increment through the REGISTERED versioned_table
   sink; a poisoned batch is refused executor-side BEFORE any file
   lands, the table untouched.
3. EVOLVE the partition layout (metadata-only): later commits land
   hive-partitioned by priority, old dirs stay flat, reads conform.
4. optimize(cluster_by=[...]) reads footer ranges and Z-ORDERS the
   snapshot so range reads prune on every clustered dimension.
5. SHALLOW-CLONE the governed table for an experiment (zero-copy),
   mutate the clone, prove the source unchanged.
6. Report audience overlap with the THETA-SKETCH algebra (native
   intersection/difference) next to the exact sets.

Every stage is the registered, hash-checked plan or the pytest-pinned
table machinery; this file shows how they assemble into a governed
nightly pipeline.

Run: python examples/lakehouse_governance_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from python_etl_spark import get_spark  # noqa: E402
from python_etl_spark.plans import QUERIES  # noqa: E402
from python_etl_spark.sinks.table import (  # noqa: E402
    ConstraintViolationError,
    VersionedTable,
)
from python_etl_spark.sinks.table_stream import (  # noqa: E402
    VersionedTableDataSource,
)
from python_etl_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="governance_"
    )
    spark = get_spark("lakehouse-governance")
    spark.dataSource.register(VersionedTableDataSource)
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
    )

    # 1. constrained create (night 0 = even keys)
    root = os.path.join(out, "orders_table")
    t = VersionedTable(root)
    t.create(
        orders.where(F.col("k") % 2 == 0),
        constraints={
            "pos_price": "price > 0",
            "has_priority": "priority IS NOT NULL",
        },
    )
    print(f"created v0 rows={t.row_count()} constraints={sorted(t.constraints())}")

    # 2. a poisoned increment is refused BEFORE any file lands
    night1 = orders.where(F.col("k") % 2 == 1)
    try:
        night1.withColumn(
            "price", F.lit(-1).cast("decimal(12,2)")
        ).write.format("versioned_table").option("path", root).mode(
            "append"
        ).save()
        raise SystemExit("BUG: poisoned batch landed")
    except Exception as e:  # noqa: BLE001 — py4j wraps the task error
        assert "pos_price" in str(e)
        print(f"poisoned_batch_refused=True table_rows={t.row_count()}")

    # 3. partition evolution, then the clean increment through the sink
    t.set_partitioning(["priority"])
    night1.write.format("versioned_table").option("path", root).mode(
        "append"
    ).save()
    print(
        f"evolved_layout={t.partition_columns()} rows={t.row_count()} "
        f"versions={t.latest_version() + 1}"
    )

    # 4. planner-driven Z-order on (k, price-bucket-ish dims)
    acts = t.optimize(
        spark, small_bytes=1, max_dirs=64, cluster_by=["k", "price"]
    )
    print(f"optimize_actions={[a['action'] for a in acts]}")

    # 5. zero-copy clone for an experiment; source stays untouched
    cl = t.clone(os.path.join(out, "orders_experiment"))
    cl.delete_where(F.col("priority") == "1-URGENT", merge_on_read=True)
    kept = cl.row_count()
    assert t.read(spark).count() == t.row_count()  # source intact
    print(f"clone_rows_after_delete={kept} source_rows={t.row_count()}")

    # 6. sketch-vs-exact audience report
    theta = {
        (r.type_a, r.type_b): r
        for r in QUERIES["events_audience_theta"](spark, sf_dir).collect()
    }
    exact = {
        (r.type_a, r.type_b): r
        for r in QUERIES["events_audience_overlap"](spark, sf_dir).collect()
    }
    worst = max(
        abs(theta[p].est_intersect - exact[p].n_both)
        / max(exact[p].n_a + exact[p].n_b - exact[p].n_both, 1)
        for p in exact
    )
    print(f"theta_pairs={len(theta)} worst_intersect_rel_err={worst:.3f}")
    print("governance_pipeline=done")


if __name__ == "__main__":
    main()
