#!/usr/bin/env python
"""Lakehouse CDC pipeline over the test corpus — the warehouse-side
shape the round-9 change feed exists for:

1. a dimension table lands in a VersionedTable (create);
2. upstream restatements arrive as MERGE commits and compliance
   deletions as DELETE commits — each persists a typed row-level
   change feed (insert / update_preimage / update_postimage / delete);
3. three consumers fold the SAME feed without ever rescanning the
   corpus:
   * a MaterializedRollup (signed-IVM fold for sum/count specs),
   * an SCD2 history (opens/closes from the typed rows),
   * a downstream CDC replay that reproduces the latest snapshot from
     the v0 baseline + feed alone;
4. maintenance runs underneath without disturbing any of them:
   clustered compaction (sort_by) is feed-invariant, RESTORE is an
   explicit re-baseline barrier, and read_pruned shows the
   dir-statistics skipping a date-windowed consumer gets for free.

At 100 TB: the feed a consumer reads is night-sized (the commits' cdf
dirs — verified via inputFiles below), the rollup rewrite is
aggregate-cardinality, and the only corpus-width work is the MERGE's
own copy-on-write rewrite.

Run: python examples/lakehouse_cdc_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from python_etl_spark import get_spark  # noqa: E402
from python_etl_spark.operators.incremental import (  # noqa: E402
    MaterializedRollup,
)
from python_etl_spark.sinks.table import VersionedTable  # noqa: E402
from python_etl_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("lakehouse-cdc-example")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="lakehouse_cdc_")

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").cast("decimal(28,6)").alias("price"),
    )

    # -- 1. the dimension lands ------------------------------------------
    t = VersionedTable(os.path.join(root, "dim_orders"))
    t.create(orders)
    print(f"v0 create: {t.row_count()} rows (metadata-only count)")

    # -- 2. restatements + deletions, each with a typed feed -------------
    t.merge(
        orders.where(F.col("o_orderkey") % 5 == 0).select(
            "o_orderkey",
            "priority",
            (F.col("price") + 100).cast("decimal(28,6)").alias("price"),
        ),
        ["o_orderkey"],
    )
    t.delete_where(F.col("o_orderkey") % 7 == 0)
    feed = t.row_changes(spark, 0)
    by_type = {
        r["_change_type"]: r["n"]
        for r in feed.groupBy("_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    print(f"typed feed: {by_type}")
    assert all("/cdf-" in f for f in feed.inputFiles()), (
        "the feed must read ONLY the commits' change files"
    )

    # -- 3a. maintained rollup folds the feed (never rescans) ------------
    roll = MaterializedRollup(
        os.path.join(root, "rollup"),
        keys=["priority"],
        spec={"n_orders": ("count", "o_orderkey"), "rev": ("sum", "price")},
    )
    roll.refresh(t, spark)  # initial build
    one_shot = {
        r["priority"]: (r["n_orders"], r["rev"])
        for r in t.read(spark)
        .groupBy("priority")
        .agg(F.count("o_orderkey").alias("n_orders"), F.sum("price").alias("rev"))
        .collect()
    }
    maintained = {
        r["priority"]: (r["n_orders"], r["rev"])
        for r in roll.read(spark).collect()
    }
    assert maintained == one_shot
    print(f"rollup maintained == one-shot recompute ({len(maintained)} keys)")

    # -- 3b. SCD2 history from the feed ----------------------------------
    base = t.read(spark, 0)
    opens = base.select(
        "o_orderkey", "price", F.lit(0).cast("long").alias("vf")
    ).unionByName(
        feed.where(
            F.col("_change_type").isin("insert", "update_postimage")
        ).select("o_orderkey", "price", F.col("_commit_version").alias("vf"))
    )
    closes = feed.where(
        F.col("_change_type").isin("update_preimage", "delete")
    ).select(F.col("o_orderkey").alias("ck"), F.col("_commit_version").alias("cv"))
    hist = (
        opens.join(
            closes,
            (opens["o_orderkey"] == closes["ck"]) & (closes["cv"] > opens["vf"]),
            "left",
        )
        .groupBy("o_orderkey", "price", "vf")
        .agg(F.min("cv").alias("vt"))
    )
    n_versions = hist.count()
    n_current = hist.where(F.col("vt").isNull()).count()
    print(f"SCD2 history: {n_versions} versions, {n_current} current")

    # -- 3c. CDC replay reproduces the snapshot --------------------------
    w = Window.partitionBy("o_orderkey").orderBy(
        F.desc("_commit_version"),
        F.when(F.col("_change_type") == "update_preimage", 1).otherwise(0),
    )
    last = feed.withColumn("rn", F.row_number().over(w)).where("rn = 1")
    alive = last.where(
        F.col("_change_type").isin("insert", "update_postimage")
    ).select("o_orderkey", "priority", "price")
    replayed = (
        base.join(last.select("o_orderkey"), "o_orderkey", "left_anti")
        .select("o_orderkey", "priority", "price")
        .unionByName(alive)
    )
    assert replayed.exceptAll(t.read(spark)).count() == 0
    assert t.read(spark).exceptAll(replayed).count() == 0
    print("CDC replay of (v0 + feed) == latest snapshot")

    # -- 3d. the same feed as a REGISTERED STREAM (r10) -------------------
    # offsets are commit versions, so checkpoint restarts resume at the
    # right commit and a re-baseline barrier would fail the stream
    # loudly instead of leaving a silent gap
    from python_etl_spark.sources.table_changes import (
        TableChangesDataSource,
    )

    spark.dataSource.register(TableChangesDataSource)
    folded = []

    def fold(batch_df, _bid):
        folded.append(batch_df.count())

    q = (
        spark.readStream.format("table_changes")
        .option("startingVersion", 0)
        .load(t.root)
        .writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    assert sum(folded) == feed.count()
    print(
        f"table_changes stream (commit-version offsets) folded "
        f"{sum(folded)} change rows == the batch feed"
    )

    # -- 4. maintenance under the consumers ------------------------------
    t.compact(spark, sort_by=["o_orderkey"], n_files=4)
    roll.refresh(t, spark)  # compaction is feed-invariant: no rebuild
    # two "nightly" appends with disjoint key ranges: the layout that
    # makes dir-granularity skipping bite — a key-window read opens
    # only the overlapping commit dir, never the compacted corpus
    t.append(orders.select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "priority", "price"))
    t.append(orders.select(
        (F.col("o_orderkey") + 20_000_000).alias("o_orderkey"),
        "priority", "price"))
    roll.refresh(t, spark)
    pruned = t.read_pruned(
        spark, "o_orderkey", lo=10_000_000, hi=19_999_999
    )
    print(
        f"clustered compaction + dir skipping: night-window read "
        f"opened {len(pruned.inputFiles())} of "
        f"{len(t.read(spark).inputFiles())} files "
        f"({pruned.count()} rows)"
    )
    v_before = t.latest_version()
    t.restore(0)
    try:
        t.row_changes(spark, v_before)
    except ValueError as e:
        print(f"RESTORE is an explicit re-baseline barrier: {e}")
    roll.rebuild(t, spark)
    print(f"rollup re-baselined on the restored snapshot "
          f"({roll.read(spark).count()} keys)")

    # -- 5. the round-10 write path ---------------------------------------
    # conditional MERGE: update only where the source is newer, drop
    # flagged rows, insert the rest — one commit, feed typed per clause
    v = t.latest_version()
    t.merge(
        orders.where(F.col("o_orderkey") % 3 == 0).select(
            "o_orderkey",
            "priority",
            (F.col("price") + 1).cast("decimal(28,6)").alias("price"),
        ),
        ["o_orderkey"],
        when_matched_update="s.price > t.price",
        when_matched_delete="t.o_orderkey % 13 = 0",
        when_not_matched_insert=True,
    )
    per_clause = {
        r["_change_type"]: r["n"]
        for r in t.row_changes(spark, v)
        .groupBy("_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    print(f"conditional MERGE feed, typed per fired clause: {per_clause}")

    # merge-on-read delete: a tombstone sidecar, ZERO data files
    # rewritten — the delete-heavy nightly shape
    dirs_before = list(t._read_manifest()["data_dirs"])
    t.delete_where(F.col("o_orderkey") % 17 == 0, merge_on_read=True)
    assert t._read_manifest()["data_dirs"] == dirs_before
    print(
        f"merge-on-read delete rewrote 0 data files; "
        f"metadata-only row_count = {t.row_count()}"
    )

    # type-widening nightly append: decimal grows, a column appears —
    # no rewrite, reads conform by cast
    t.append(
        orders.select(
            (F.col("o_orderkey") + 30_000_000).alias("o_orderkey"),
            "priority",
            F.col("price").cast("decimal(30,6)").alias("price"),
            F.lit("night-31").alias("src_batch"),
        ),
        allow_evolution=True,
    )
    got = t.read(spark)
    assert got.schema["price"].dataType.simpleString() == "decimal(30,6)"
    print(
        f"widened append: snapshot schema now "
        f"{[f.dataType.simpleString() for f in got.schema.fields]}, "
        f"{got.count()} rows"
    )

    # -- 6. the round-11 write path ---------------------------------------
    # schema-EVOLVING merge: the feed schema grew a column upstream —
    # without the flag this RAISES (no more silent column drops);
    # with it the new column joins the snapshot schema
    v = t.latest_version()
    evolved_batch = orders.where(F.col("o_orderkey") % 30 == 1).select(
        "o_orderkey",
        "priority",
        F.col("price").cast("decimal(30,6)").alias("price"),
        F.lit("night-31").alias("src_batch"),
        F.lit("restated").alias("reason"),
    )
    try:
        t.merge(evolved_batch, ["o_orderkey"])
        raise AssertionError("drift should have raised")
    except ValueError as e:
        print(f"drifted MERGE refused loudly: {str(e)[:84]}...")
    t.merge(evolved_batch, ["o_orderkey"], allow_evolution=True)
    print(
        f"evolving MERGE added 'reason'; feed rows in the evolved "
        f"schema: {t.row_changes(spark, v).columns[-3:]}"
    )

    # metadata-only column RENAME: zero files touched, full history
    dirs_before = list(t._read_manifest()["data_dirs"])
    t.rename_column("price", "amount")
    assert t._read_manifest()["data_dirs"] == dirs_before
    print(
        f"renamed price -> amount metadata-only; "
        f"columns now {t.read(spark).columns}"
    )

    # keyed MOR delete: the tombstone sidecar holds ONLY the key
    t.delete_where(
        F.col("o_orderkey") % 19 == 0,
        merge_on_read=True,
        key_cols=["o_orderkey"],
    )
    dv = t._read_manifest()["dvs"][-1]["dir"]
    print(
        f"keyed MOR delete: tombstone schema = "
        f"{spark.read.parquet(dv).columns} (wide rows never shuffle)"
    )

    # one optimize() call reads the pressures this pipeline created
    # (DV tombstones + small commit dirs) and fixes them in order
    actions = t.optimize(spark, small_bytes=1 << 26, dv_ratio=0.001)
    print(
        "optimize() planned: "
        + (", ".join(f"{a['action']} ({a['reason']})" for a in actions)
           or "nothing (healthy table)")
    )
    assert "dvs" not in t._read_manifest()
    print(f"post-maintenance snapshot: {t.row_count()} rows — pipeline complete")


if __name__ == "__main__":
    main()
