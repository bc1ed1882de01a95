#!/usr/bin/env python
"""Cold-JVM A/B for sim_topk_bruteforce variants (guide §1: measure the
driver's methodology — fresh JVM, one untimed warm pass, one timed pass).

Usage: python scripts/ab_bruteforce.py {full_unroll|dot_unroll|fold}
Prints one JSON line {"variant":..., "warm_s":..., "timed_s":...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANT = sys.argv[1]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from python_etl_spark.functions.vector import (
        as_double,
        cosine_from_parts,
        dot_exact,
        dot_unrolled,
        norm_sq_exact,
    )
    from python_etl_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    dim = 64
    if VARIANT == "full_unroll":
        nsq = dot_unrolled("vec", "vec", dim)
        dp = dot_unrolled("qvec", "cvec", dim)
    elif VARIANT == "dot_unroll":
        nsq = norm_sq_exact("vec")
        dp = dot_unrolled("qvec", "cvec", dim)
    else:
        nsq = norm_sq_exact("vec")
        dp = dot_exact("qvec", "cvec")
    v = emb.select(
        F.col("vec_id").alias("id"), as_double("embedding").alias("vec")
    ).select("id", "vec", nsq.alias("nsq"))
    queries = v.where(F.col("id").isin(list(range(10)))).select(
        F.col("id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("nsq").alias("qnsq"),
    )
    corpus = v.select(
        F.col("id").alias("neighbor_id"),
        F.col("vec").alias("cvec"),
        F.col("nsq").alias("cnsq"),
    )
    cos = cosine_from_parts(dp, F.col("qnsq"), F.col("cnsq"))
    scored = (
        corpus.join(F.broadcast(queries))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def main() -> None:
    from python_etl_spark.session import get_spark

    spark = get_spark("ab-bruteforce")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    build(spark).count()
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = build(spark).count()
    timed = time.perf_counter() - t0
    print(json.dumps({
        "variant": VARIANT, "rows": n,
        "warm_s": round(warm, 3), "timed_s": round(timed, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
