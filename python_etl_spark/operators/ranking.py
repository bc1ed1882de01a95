"""Global ordering ranks without a single-partition window.

``Window.orderBy(...)`` with no ``partitionBy`` funnels every row
through ONE task (Spark plans an ``Exchange SinglePartition``) — the
classic scale-killer for global ntile/percent_rank/row_number. This
module computes the same ranks with bounded per-task work:

1. ``repartitionByRange`` on the order keys — each partition holds a
   contiguous key range, partitions are range-ordered.
2. ``row_number`` within each partition (parallel windows).
3. Add per-partition offsets: the cumulative row counts of the
   preceding partitions. Only O(num_partitions) counts ever reach the
   driver — never row data — and they're re-joined via a broadcast.

The order must be TOTAL (include a unique tiebreak column): with a
total order rank == row_number, so percent_rank/cume_dist/ntile all
derive from the global rank by closed-form arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_cols: list[str | Column],
    rank_col: str = "__rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Return (df + 1-based ``rank_col`` over the total order, total row
    count). Two passes over the range-partitioned input (count, then
    rank); the frame is materialized once via localCheckpoint so both
    passes see identical partition boundaries and the scan runs once.
    (localCheckpoint, not persist: the checkpointed RDD is reclaimed by
    the ContextCleaner when the result goes out of scope, so repeated
    calls don't accumulate cached partitions for the session lifetime —
    an explicit .persist() here leaked until session shutdown.)"""
    spark = df.sparkSession
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(n_parts, *cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sizes = {
        r["__pid"]: r["n"]
        for r in part.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(sizes):
        offsets.append((pid, acc))
        acc += sizes[pid]
    off_df = spark.createDataFrame(
        offsets or [(0, 0)], "__pid int, __off long"
    )
    w = Window.partitionBy("__pid").orderBy(*cols)
    ranked = (
        part.join(F.broadcast(off_df), "__pid")
        .withColumn(rank_col, F.row_number().over(w) + F.col("__off"))
        .drop("__pid", "__off")
    )
    return ranked, acc


def with_ntile(
    df: DataFrame,
    order_cols: list[str | Column],
    buckets: int,
    out_col: str = "ntile",
    num_partitions: int | None = None,
) -> DataFrame:
    """SQL ``NTILE(buckets)`` over a global total order, scale-safe.

    NTILE semantics: with n rows, the first ``n % buckets`` tiles get
    ``n // buckets + 1`` rows, the rest ``n // buckets``. Closed-form
    from the global rank — embarrassingly parallel."""
    ranked, n = global_rank(df, order_cols, "__r", num_partitions)
    q, rem = divmod(n, buckets)
    r = F.col("__r")
    if q == 0:
        tile = r
    else:
        big = rem * (q + 1)  # rows covered by the (q+1)-sized tiles
        tile = F.when(
            r <= big, F.floor((r - 1) / (q + 1)) + 1
        ).otherwise(F.lit(rem) + F.floor((r - 1 - big) / q) + 1)
    return ranked.withColumn(out_col, tile.cast("int")).drop("__r")


def with_percent_rank(
    df: DataFrame,
    order_cols: list[str | Column],
    pr_col: str = "pr",
    cd_col: str = "cd",
    num_partitions: int | None = None,
) -> DataFrame:
    """``percent_rank()`` and ``cume_dist()`` over a global TOTAL order
    (keys must be unique, e.g. tiebroken by a key column — then
    rank == row_number and pr=(r-1)/(n-1), cd=r/n exactly)."""
    ranked, n = global_rank(df, order_cols, "__r", num_partitions)
    r = F.col("__r")
    pr = (
        F.lit(0.0)
        if n <= 1
        else (r - 1).cast("double") / F.lit(float(n - 1))
    )
    cd = r.cast("double") / F.lit(float(max(n, 1)))
    return (
        ranked.withColumn(pr_col, pr)
        .withColumn(cd_col, cd)
        .drop("__r")
    )


def global_cumsum(
    df: DataFrame,
    order_cols: list[str | Column],
    val_col: str | Column,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Running total over a global TOTAL order without a
    single-partition window: range-partition on the order keys,
    per-partition prefix sums (parallel windows), then add each
    partition's broadcast starting offset (the sum of all preceding
    partitions). Only O(num_partitions) partial sums reach the driver.
    Materialized via localCheckpoint (not persist) for the same
    leak-free stable-boundary reasons as global_rank; an all-NULL
    partition's sum coalesces to 0 so the offset accumulation never
    sees None."""
    spark = df.sparkSession
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    v = F.col(val_col) if isinstance(val_col, str) else val_col
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(n_parts, *cols)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__v", v)
        .localCheckpoint(eager=True)
    )
    sums = {
        r["__pid"]: r["s"]
        for r in part.groupBy("__pid")
        .agg(F.coalesce(F.sum("__v"), F.lit(0)).alias("s"))
        .collect()
    }
    offsets, acc = [], 0
    for pid in sorted(sums):
        offsets.append((pid, acc))
        acc += sums[pid]
    off_df = spark.createDataFrame(offsets or [(0, 0)], "__pid int, __off long")
    w = (
        Window.partitionBy("__pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        part.join(F.broadcast(off_df), "__pid")
        .withColumn(out_col, F.sum("__v").over(w) + F.col("__off"))
        .drop("__pid", "__off", "__v")
    )
