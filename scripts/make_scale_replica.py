"""Build a deterministic Nx replica of a testdata scale-factor dir for
scale rehearsals (default 10x of sf0.1 ~= sf1).

Usage: python scripts/make_scale_replica.py [src_dir] [out_dir] [factor]

Each copy i gets disjoint key spaces (every key column shifted by
i * 100M) with referential integrity preserved copy-locally, so join
selectivities and group cardinalities scale the way a real 10x corpus
does:

* region/nation: fixed dims, copied once (TPC-H semantics).
* customer/supplier/part/orders/lineitem/events: key offsets only —
  value distributions untouched.
* documents: every WORD of copy i>0 gets an ``_i`` suffix, so shingle
  sets never collide across copies while each copy keeps the original
  within-copy duplicate structure (planted twins stay twins; the
  corpus-wide duplicate RATE is preserved, pair volume scales ~Nx,
  not N^2 x).
* embeddings: copy i's vectors are circularly shifted by i dimensions
  — norms and within-copy cosines are preserved exactly, cross-copy
  cosines decorrelate, so ANN neighbor structure scales realistically.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def replicate(
    spark, src: str, out: str, factor: int = 10, tables: list[str] | None = None
) -> None:
    """``tables`` restricts the build to a subset (e.g. ["documents"]
    for the 100x documents-only rehearsal — a full 100x of lineitem
    would not be worth the disk)."""
    from python_etl_spark.sources.tables import load_table

    OFF = 100_000_000

    def wanted(name: str) -> bool:
        return tables is None or name in tables

    def copies(df, transform):
        parts = [transform(df, i) for i in range(factor)]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    def offset(cols):
        def t(df, i):
            return df.select(
                *[
                    (F.col(c) + F.lit(i * OFF)).alias(c)
                    if c in cols
                    else F.col(c)
                    for c in df.columns
                ]
            )

        return t

    plan = {
        "customer": offset(["c_custkey"]),
        "supplier": offset(["s_suppkey"]),
        "part": offset(["p_partkey"]),
        "orders": offset(["o_orderkey", "o_custkey"]),
        "lineitem": offset(["l_orderkey", "l_partkey", "l_suppkey"]),
        "events": offset(["event_id", "user_id"]),
    }

    for name in ["region", "nation"]:
        if wanted(name):
            load_table(spark, src, name).write.mode("overwrite").parquet(
                f"{out}/{name}.parquet"
            )
    for name, t in plan.items():
        if wanted(name):
            copies(load_table(spark, src, name), t).repartition(8).write.mode(
                "overwrite"
            ).parquet(f"{out}/{name}.parquet")

    def doc_copy(df, i):
        df = df.select(
            (F.col("doc_id") + F.lit(i * OFF)).alias("doc_id"),
            "text", "lang", "source",
        )
        if i > 0:
            df = df.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split("text", " ", -1),
                        lambda w: F.concat(w, F.lit(f"_{i}")),
                    ),
                    " ",
                ),
            )
        return df.withColumn("n_chars", F.length("text").cast("long"))

    if wanted("documents"):
        copies(load_table(spark, src, "documents"), doc_copy).repartition(
            max(8, factor // 4)
        ).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    def emb_copy(df, i):
        d = F.size("embedding")
        shifted = (
            F.concat(
                F.slice("embedding", F.lit(i + 1), d - F.lit(i)),
                F.slice("embedding", 1, i),
            )
            if i > 0
            else F.col("embedding")
        )
        return df.select(
            (F.col("vec_id") + F.lit(i * OFF)).alias("vec_id"),
            shifted.alias("embedding"),
            "label",
        )

    if wanted("embeddings"):
        copies(load_table(spark, src, "embeddings"), emb_copy).repartition(
            8
        ).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")


def skew_replicate(
    spark, src: str, out: str, hot_copies: int = 8, hot_keys: int = 1
) -> list[int]:
    """Zipfian-head skew replica for the skew-join rehearsal: orders is
    copied unchanged; lineitem gains ``hot_copies`` extra full copies,
    copy j remapped ENTIRELY onto hot key ``j % hot_keys`` (the
    smallest existing orderkeys) — so a handful of head keys each carry
    multiples of |lineitem| rows while the tail keeps its natural ~4.
    This is the shape that melts an unassisted sort-merge join (one
    reducer owns a head key) and that AQE skew-split / salting exist
    to fix. Returns the hot keys."""
    from python_etl_spark.sources.tables import load_table

    li = load_table(spark, src, "lineitem")
    orders = load_table(spark, src, "orders")
    hot = [
        r["l_orderkey"]
        for r in li.select("l_orderkey").distinct().orderBy("l_orderkey")
        .limit(hot_keys).collect()
    ]
    skewed = li
    for j in range(hot_copies):
        k = hot[j % len(hot)]
        skewed = skewed.unionByName(
            li.select(
                *[
                    F.lit(k).cast("long").alias(c)
                    if c == "l_orderkey"
                    else F.col(c)
                    for c in li.columns
                ]
            )
        )
    skewed.repartition(8).write.mode("overwrite").parquet(
        f"{out}/lineitem.parquet"
    )
    orders.write.mode("overwrite").parquet(f"{out}/orders.parquet")
    return hot


if __name__ == "__main__":
    if "--skew" in sys.argv:
        argv = [a for a in sys.argv if a != "--skew"]
        src = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
        out = argv[2] if len(argv) > 2 else ".scratch/sf_skew"
        hot_copies = int(argv[3]) if len(argv) > 3 else 4
        from python_etl_spark.session import get_spark

        spark = get_spark()
        hot = skew_replicate(spark, src, out, hot_copies)
        print("hot keys:", hot)
        print("lineitem", spark.read.parquet(f"{out}/lineitem.parquet").count())
        sys.exit(0)
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else ".scratch/sf1x"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    tables = sys.argv[4].split(",") if len(sys.argv) > 4 else None
    from python_etl_spark.session import get_spark

    spark = get_spark()
    replicate(spark, src, out, factor, tables)
    for t in tables or ["lineitem", "documents", "embeddings"]:
        print(t, spark.read.parquet(f"{out}/{t}.parquet").count())
