#!/usr/bin/env python
"""End-to-end incremental (high-watermark) ETL pipeline:

1. Nightly-run shape: bootstrap a versioned table from the orders
   up to a cutoff date, bookmark committed atomically with the data.
2. Next "night": hand the loader the FULL source — only rows past the
   bookmark are extracted (pushdown predicate, prunes files on a
   date-partitioned source), MERGE-appended, bookmark advanced.
3. Crash drill: kill the writer between extract and commit, retry,
   and show the table is exactly-once either way.

Run: python examples/incremental_pipeline.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from python_etl_spark.incremental import incremental_load, last_watermark
from python_etl_spark.pipeline import Pipeline
from python_etl_spark.session import get_spark
from python_etl_spark.sinks.table import VersionedTable
from python_etl_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("incremental-example")
    spark.sparkContext.setLogLevel("ERROR")

    orders = load_table(spark, sf_dir, "orders")
    root = tempfile.mkdtemp(prefix="inc_example_")
    shutil.rmtree(root)
    table = VersionedTable(root)

    # -- night 1: bootstrap up to the cutoff --------------------------------
    cutoff = "1995-06-01"
    p1 = (
        Pipeline(spark)
        .extract_df(
            "orders", orders.where(F.col("o_orderdate") <= F.lit(cutoff))
        )
        .load_incremental("orders", root, "o_orderdate")
    )
    p1.run()
    r1 = p1.incremental_results["orders"]
    print(f"night 1: v{r1['version']} loaded {r1['rows_loaded']} rows, "
          f"bookmark={r1['watermark']}")

    # -- night 2: full source, loader takes only the new tail ---------------
    p2 = (
        Pipeline(spark)
        .extract_df("orders", orders)
        .load_incremental("orders", root, "o_orderdate")
    )
    p2.run()
    r2 = p2.incremental_results["orders"]
    print(f"night 2: v{r2['version']} loaded {r2['rows_loaded']} rows, "
          f"bookmark={r2['watermark']}")

    # -- night 3: nothing new -> no commit ----------------------------------
    r3 = incremental_load(orders, table, "o_orderdate")
    print(f"night 3: no new rows -> version stays {r3['version']}, "
          f"rows_loaded={r3['rows_loaded']}")

    # -- crash drill --------------------------------------------------------
    extra = orders.select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        *[c for c in orders.columns if c not in ("o_orderkey", "o_orderdate")],
        F.date_add(F.col("o_orderdate"), 5000).alias("o_orderdate"),
    ).limit(500)
    full_plus = orders.unionByName(extra.select(*orders.columns))

    orig = VersionedTable._commit
    VersionedTable._commit = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("simulated crash")
    )
    try:
        incremental_load(full_plus, table, "o_orderdate")
    except RuntimeError as e:
        print(f"crash drill: writer died ({e}); bookmark still "
              f"{last_watermark(table)}")
    finally:
        VersionedTable._commit = orig

    r4 = incremental_load(full_plus, table, "o_orderdate")
    print(f"retry: v{r4['version']} loaded {r4['rows_loaded']} rows "
          f"(the 500 late arrivals, exactly once)")

    snap = table.read(spark)
    n, nd = snap.count(), snap.select("o_orderkey").distinct().count()
    print(f"final snapshot: {n} rows, {nd} distinct keys "
          f"({'exactly-once OK' if n == nd else 'DUPES!'})")
    print(f"history: {[m['op'] for m in table.history()]}")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
