#!/usr/bin/env python
"""End-to-end web-crawl curation pipeline, from the wire format in:

0. Pack deterministic synthetic crawl pages into REAL .warc.gz
   containers (per-record gzip members, HTTP response framing — the
   Common Crawl layout) and re-ingest them with sources/warc.read_warc
   (one task per container, the production ingest shape).
1. Recover URL + HTML per document from the WARC records.
2. URL hygiene: canonicalize, drop blocklisted registered domains,
   keep-first dedup on the canonical (host, path).
3. HTML -> text: Arrow-batched stdlib extraction with link-density
   boilerplate filtering.
4. Token accounting: train a mini-BPE merge table on the surviving
   corpus, report the per-language training mixture in BPE tokens.

Everything downstream of (0) is the real operator surface a crawl
pipeline runs before the text-analysis suite ever sees clean documents.

Run: python examples/web_curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from python_etl_spark.operators.bpe import (
    corpus_word_counts,
    doc_token_counts,
    train_bpe,
)
from python_etl_spark.operators.html import html_extract_col
from python_etl_spark.plans.web import _BLOCKLIST, _canonical, _urls, _warc_docs
from python_etl_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("web-curation-example")
    spark.sparkContext.setLogLevel("ERROR")

    # -- 0: WARC ingest (packs the containers on first use) -----------------
    warc = _warc_docs(spark, sf_dir)
    n_rec = warc.count()
    print(f"warc: {n_rec} response records ingested from .warc.gz")

    # -- 1+2: URL hygiene ---------------------------------------------------
    urls = _urls(spark, sf_dir)
    canon = _canonical(urls)
    bl = spark.createDataFrame([(d,) for d in _BLOCKLIST], "domain string")
    allowed = canon.join(
        F.broadcast(bl),
        (F.col("host") == F.col("domain"))
        | F.col("host").endswith(F.concat(F.lit("."), F.col("domain"))),
        "left_anti",
    )
    frontier = allowed.groupBy("host", "path").agg(
        F.min("doc_id").alias("doc_id"),
        (F.count(F.lit(1)) - 1).alias("n_dups"),
    )
    n_raw, n_allowed = urls.count(), allowed.count()
    n_frontier = frontier.count()
    print(
        f"urls: {n_raw} raw -> {n_allowed} after blocklist "
        f"-> {n_frontier} unique canonical pages "
        f"({n_allowed - n_frontier} dups collapsed)"
    )

    # -- 3: HTML -> text for the surviving frontier, FROM the WARC body -----
    pages = warc.select("doc_id", "html").join(
        frontier.select("doc_id"), "doc_id"
    )
    extracted = pages.select(
        "doc_id",
        html_extract_col("html").alias("e"),
    ).select(
        "doc_id",
        F.col("e.extracted_text").alias("text"),
        F.col("e.n_kept").alias("n_kept"),
        F.col("e.n_dropped").alias("n_dropped"),
    )
    stats = extracted.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_kept").alias("kept"),
        F.sum("n_dropped").alias("dropped"),
    ).first()
    print(
        f"extraction: {stats['docs']} pages, {stats['kept']} content lines "
        f"kept, {stats['dropped']} boilerplate lines dropped"
    )

    # -- 4: BPE token accounting on the cleaned text ------------------------
    merges = train_bpe(corpus_word_counts(extracted), 32)
    print(f"bpe: trained {len(merges)} merges; first 8: {merges[:8]}")
    tok = doc_token_counts(extracted, merges)
    mixture = (
        tok.join(
            spark.read.parquet(f"{sf_dir}/documents.parquet").select(
                "doc_id", "lang", "source"
            ),
            "doc_id",
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bpe_tokens").alias("n_bpe_tokens"),
            F.sum("n_ws_tokens").alias("n_ws_tokens"),
        )
        .orderBy("lang")
    )
    print("training mixture (BPE tokens per language):")
    for r in mixture.collect():
        ratio = r["n_bpe_tokens"] / max(r["n_ws_tokens"], 1)
        print(
            f"  {r['lang']}: {r['n_docs']} docs, "
            f"{r['n_bpe_tokens']} bpe tokens "
            f"({ratio:.2f} per whitespace token)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
