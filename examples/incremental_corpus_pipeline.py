#!/usr/bin/env python
"""Nightly incremental training-corpus pipeline (the round-8 family):

Night 1 and night 2 each deliver a crawl slice. Per slice:

1. Ingest from .warc.gz containers (sources/warc — the Common Crawl
   wire format), recover doc id + HTML, extract text.
2. Repair mojibake (latin-1⇄utf-8 round-trip to fixpoint).
3. ExactSubstr span removal within the slice (drop corpus-duplicated
   8-token windows, reassemble).
4. Cross-snapshot NEAR-dup filter against the persisted MinHash band
   store (operators/incremental) — night-2 recrawls of night-1 pages
   die here WITHOUT rescanning night-1 text; the store append is one
   atomic batch-stamped commit (crash-idempotent).
5. Observation-metered parquet write (row/null counts computed inside
   the write itself, no second scan). Downstream, assign train/eval
   with `etl_leakage_safe_split`'s cluster-level rule so near-dup
   survivors never straddle the split.

Run: python examples/incremental_corpus_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from python_etl_spark.operators.dedup import exact_substr_dedup
from python_etl_spark.operators.encoding import repair_mojibake_col
from python_etl_spark.operators.html import html_extract_col
from python_etl_spark.operators.incremental import IncrementalMinHashDeduper
from python_etl_spark.operators.metrics import (
    observe_metrics,
    row_health_metrics,
)
from python_etl_spark.plans.web import _html_docs
from python_etl_spark.session import get_spark
from python_etl_spark.sources.warc import read_warc, write_warc


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("incremental-corpus-example")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="incr_corpus_")

    # two nightly slices: evens, then odds + recrawled evens (dups)
    pages = _html_docs(spark, sf_dir)
    slices = {
        "night1": pages.where(F.col("doc_id") % 2 == 0),
        "night2": pages.where(F.col("doc_id") % 2 == 1).unionByName(
            pages.where((F.col("doc_id") % 2 == 0) & (F.col("doc_id") % 6 == 0))
            .withColumn("doc_id", F.col("doc_id") + 1000000)
        ),
    }
    dedup = IncrementalMinHashDeduper(os.path.join(work, "band_store"))

    for night, df in slices.items():
        warc_dir = os.path.join(work, f"{night}_warc")
        write_warc(
            df.select(
                F.concat(
                    F.lit("https://example.com/doc/"),
                    F.col("doc_id").cast("string"),
                ).alias("target_uri"),
                F.col("html").alias("body"),
            ).repartition(4),
            warc_dir,
        )
        recs = read_warc(spark, warc_dir).where(
            "warc_type = 'response' AND http_status = 200"
        )
        docs = recs.select(
            F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
            .cast("long")
            .alias("doc_id"),
            html_extract_col(F.col("payload").cast("string"))
            .getField("extracted_text")
            .alias("raw_text"),
        )
        fixed = docs.select(
            "doc_id",
            repair_mojibake_col("raw_text").getField("repaired").alias("text"),
        )
        spanless = exact_substr_dedup(fixed).select(
            "doc_id", F.col("dedup_text").alias("text")
        )
        accepted = dedup.accept_batch(spanless, night)
        out, obs = observe_metrics(
            accepted, f"{night}_write", *row_health_metrics("text")
        )
        out.write.mode("overwrite").parquet(os.path.join(work, night))
        m = obs.get
        print(
            f"{night}: ingested {recs.count()} warc records -> "
            f"accepted {m['n_rows']} docs "
            f"({m['n_null_text']} null texts) into {work}/{night}"
        )

    n1 = spark.read.parquet(os.path.join(work, "night1")).count()
    n2 = spark.read.parquet(os.path.join(work, "night2")).count()
    store = dedup.table.read(spark)
    print(
        f"corpus: {n1 + n2} docs over 2 nights; band store holds "
        f"{store.count()} rows for {store.select('id').distinct().count()} "
        f"docs across {dedup.table.latest_version() + 1} commits"
    )
    spark.stop()


if __name__ == "__main__":
    main()
