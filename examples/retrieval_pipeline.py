#!/usr/bin/env python
"""Retrieval pipeline over the test corpus — the serving-side shape:

ANN recall (IVF probed lists) -> hybrid scoring (dense cosine +
sparse BM25) -> MMR diversification -> final top-k, plus the
MEMORY-BOUND alternative recall path: a persisted SQ8 index
(1 byte/dim codes) searched by asymmetric distance without ever
reading the float embeddings.

The stage split mirrors production retrieval: the RECALL stage is the
only one that touches the corpus (inverted lists bound the scanned
fraction to ~nprobe/n_centroids; the SQ8 index bounds the BYTES);
scoring joins two precomputed signals on the bounded candidate set;
the re-ranker runs on dozens of rows. At 100 TB only stage 1's index
grows.

Run: python examples/retrieval_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from python_etl_spark import get_spark  # noqa: E402
from python_etl_spark.operators.similarity import (  # noqa: E402
    ivf_topk,
    mmr_rerank,
    sq8_topk_from_index,
    sq8_write_index,
)
from python_etl_spark.plans import QUERIES  # noqa: E402
from python_etl_spark.sources.tables import load_table  # noqa: E402

QUERY_VEC = 0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("retrieval-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")

    # 1. ANN recall: IVF probed inverted lists -> top-30 dense candidates
    recall = ivf_topk(emb, [QUERY_VEC], k=30, n_centroids=16, nprobe=4)
    cands = recall.select(
        F.col("neighbor_id").alias("doc_id"), F.col("cosine").alias("dense")
    )

    # 2. hybrid scoring on the BOUNDED candidate set: dense cosine +
    #    sparse BM25 (text relevance to the fixed query terms), both
    #    already engine-invariant 6-decimal values
    bm25 = QUERIES["text_bm25_score"](spark, sf_dir)
    scored = (
        cands.join(bm25, "doc_id")
        .withColumn("hybrid", F.round(F.col("dense") + F.col("bm25") / 4, 6))
        .orderBy(F.desc("hybrid"), F.asc("doc_id"))
    )
    top = scored.limit(10).collect()

    # 2b. memory-bound recall twin: persist the SQ8 index once, then
    #     search the 1-byte/dim codes by asymmetric distance — the
    #     embeddings table is never read at query time
    idx_path = os.path.join(tempfile.mkdtemp("sq8"), "index")
    bounds = sq8_write_index(emb, idx_path)
    qvec = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    adc = sq8_topk_from_index(
        spark, idx_path, bounds, qvec, k=10, exclude_id=QUERY_VEC
    ).collect()

    # 3. MMR diversification of the dense pool (lambda = 1/2)
    mmr = mmr_rerank(emb, query_id=QUERY_VEC, pool_n=20, k=5)
    final = mmr.join(
        docs.select("doc_id", "lang", "source"),
        mmr.vec_id == docs.doc_id,
    ).orderBy("rank")

    print("hybrid top-10 (dense + bm25/4):")
    for r in top:
        print(
            f"  doc {r['doc_id']:>6}  dense={r['dense']:.4f} "
            f"bm25={r['bm25']:.4f} hybrid={r['hybrid']:.4f}"
        )
    print("SQ8-index ADC top-10 (codes only, no float reads):")
    for r in adc:
        print(f"  doc {r['neighbor_id']:>6}  adc_micro={r['adc_micro']}")
    print("MMR-diversified top-5:")
    for r in final.collect():
        print(
            f"  #{r['rank']} doc {r['vec_id']:>6}  rel={r['rel']:.4f} "
            f"lang={r['lang']} source={r['source']}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
