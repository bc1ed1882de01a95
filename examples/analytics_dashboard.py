#!/usr/bin/env python
"""End-to-end analytics pipeline on the star schema + event stream:

conform dimensions -> revenue KPIs by region/month -> activity heatmap
-> DAU/WAU engagement -> anomaly flags -> one parquet dashboard layer.

Every stage is the registered, DuckDB-hash-checked plan (or composed
from the same operators); this file shows how they assemble into the
materialized dashboard tables a BI layer would read.

Run: python examples/analytics_dashboard.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from python_etl_spark import get_spark  # noqa: E402
from python_etl_spark.functions.exact import dsum  # noqa: E402
from python_etl_spark.plans import QUERIES  # noqa: E402
from python_etl_spark.sinks.writers import write_parquet  # noqa: E402
from python_etl_spark.sources.tables import load_tables  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp("dash-")
    spark = get_spark("analytics-dashboard")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir)

    # 1. revenue by region x month: the 6-way star join with every
    # dimension broadcast; the fact shuffles once for the agg
    revenue = (
        t["lineitem"]
        .join(t["orders"], t["lineitem"].l_orderkey == t["orders"].o_orderkey)
        .join(F.broadcast(t["customer"]),
              t["orders"].o_custkey == t["customer"].c_custkey)
        .join(F.broadcast(t["nation"]),
              t["customer"].c_nationkey == t["nation"].n_nationkey)
        .join(F.broadcast(t["region"]),
              t["nation"].n_regionkey == t["region"].r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"),
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )

    # 2-4. engagement: the registered (hash-checked) event rollups
    heatmap = QUERIES["events_heatmap_hour_dow"](spark, sf_dir)
    engagement = QUERIES["events_dau_wau"](spark, sf_dir)
    anomalies = QUERIES["events_anomaly_zscore"](spark, sf_dir)

    # 5. materialize the dashboard layer
    parts = {
        "revenue_region_month": revenue,
        "activity_heatmap": heatmap,
        "engagement_daily": engagement,
        "volume_anomalies": anomalies,
    }
    counts = {}
    for name, df in parts.items():
        write_parquet(df, f"{out_dir}/{name}.parquet")
        counts[name] = spark.read.parquet(f"{out_dir}/{name}.parquet").count()

    print(
        " ".join(f"{k}={v}" for k, v in counts.items()) + f" -> {out_dir}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
