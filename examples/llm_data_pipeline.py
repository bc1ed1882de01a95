#!/usr/bin/env python
"""End-to-end LLM training-data pipeline on the test corpus:

ingest documents -> quality filter -> language filter -> exact dedup ->
MinHash near-dedup -> PII redaction -> benchmark decontamination ->
sequence packing -> write curated parquet.

Run: python examples/llm_data_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from python_etl_spark import get_spark  # noqa: E402
from python_etl_spark.functions.text import stopword_count, ws_tokens  # noqa: E402
from python_etl_spark.operators.components import dedup_keepers  # noqa: E402
from python_etl_spark.operators.dedup import near_dup, shingles  # noqa: E402
from python_etl_spark.operators.ranking import global_cumsum  # noqa: E402
from python_etl_spark.operators.quality import validate  # noqa: E402
from python_etl_spark.sinks.writers import write_parquet  # noqa: E402
from python_etl_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp("llm-out")
    spark = get_spark("llm-data-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. quality gate (JVM expressions only)
    toks = ws_tokens("text")
    docs = docs.withColumn("n_words", F.size(toks)).withColumn(
        "stop_ratio", stopword_count(toks).cast("double") / F.col("n_words")
    )
    valid, quarantined = validate(
        docs,
        {
            "min_length": F.col("n_words") >= 10,
            "max_length": F.col("n_words") <= 10_000,
            "nonempty": F.length("text") > 0,
        },
    )
    n1 = valid.count()

    # 1b. DSIR importance resampling toward the en target: drop the
    # bottom-quartile least-target-like documents. The ratio table is
    # 64 broadcast rows; the threshold is a single driver scalar.
    from python_etl_spark.operators.importance import dsir_logweights

    scores = dsir_logweights(valid, F.col("lang") == "en")
    thr = scores.agg(
        F.percentile("dsir_logweight", F.lit(0.25)).alias("t")
    ).first()["t"]
    valid = valid.join(
        scores.where(F.col("dsir_logweight") >= thr).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    n1b = valid.count()

    # 2. exact dedup: keep lowest doc_id per identical text
    keep = valid.groupBy(F.md5(F.encode(F.col("text"), "UTF-8")).alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    deduped = valid.join(keep.select("doc_id"), "doc_id", "left_semi")
    n2 = deduped.count()

    # 2b. prefix-fingerprint dedup: one cheap scan catches templated
    # openings (boilerplate pages) before MinHash spends real money
    prefix_fp = F.md5(
        F.encode(
            F.concat_ws(" ", F.slice(F.split("text", " ", -1), 1, 16)),
            "UTF-8",
        )
    )
    pkeep = deduped.groupBy(prefix_fp.alias("pfp")).agg(
        F.min("doc_id").alias("doc_id")
    )
    deduped = deduped.join(pkeep.select("doc_id"), "doc_id", "left_semi")
    n2b = deduped.count()

    # 2c. C4-style segment-level dedup: remove boilerplate SEGMENTS
    # repeated across the corpus (keep-first, reassemble in order),
    # then drop docs whose text fully disappeared
    from python_etl_spark.operators.dedup import segment_dedup

    seg = segment_dedup(deduped, width=8).where(F.col("n_kept") > 0)
    deduped = (
        deduped.drop("text", "n_words")
        .join(
            seg.select(
                F.col("id").alias("doc_id"),
                F.col("text_out").alias("text"),
            ),
            "doc_id",
        )
        .withColumn("n_words", F.size(F.split("text", " ", -1)))
    )
    n2c = deduped.count()

    # 3. near-dedup: MinHash-LSH pairs -> connected components -> keep
    # the lowest doc_id per duplicate cluster
    pairs = near_dup(deduped, method="minhash", threshold=0.6)
    curated = dedup_keepers(deduped, pairs)
    n3 = curated.count()

    # 4. PII redaction (zero-shuffle regex projection)
    email_re = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+"
    curated = curated.withColumn(
        "text", F.regexp_replace("text", email_re, "<EMAIL>")
    )

    # 5. benchmark decontamination: drop docs whose 3-gram overlap with
    # the (broadcast) held-out benchmark shingle set exceeds 20%
    bench_sh = (
        shingles(curated.where(F.col("doc_id") % 97 == 0), k=3)
        .select(F.xxhash64("shingle").alias("sid"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    corp_sh = shingles(
        curated.where(F.col("doc_id") % 97 != 0), k=3
    ).select("id", F.xxhash64("shingle").alias("sid"))
    frac = (
        corp_sh.join(F.broadcast(bench_sh), "sid", "left")
        .groupBy("id")
        .agg(
            (
                F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("double")
                / F.count(F.lit(1))
            ).alias("overlap")
        )
    )
    contaminated = frac.where(F.col("overlap") > 0.2).select(
        F.col("id").alias("doc_id")
    )
    clean = curated.where(F.col("doc_id") % 97 != 0).join(
        contaminated, "doc_id", "left_anti"
    )
    n4 = clean.count()

    # 6. sequence packing: 2048-token micro-batches over a deterministic
    # hash order (scale-safe global running total)
    packed = global_cumsum(
        clean.withColumn(
            "h", F.md5(F.col("doc_id").cast("string"))
        ),
        ["h", "doc_id"],
        "n_words",
        "cum",
    ).withColumn(
        "bin",
        F.floor((F.col("cum") - F.col("n_words")).cast("double") / 2048),
    )

    # 7. write curated set partitioned by language
    path = write_parquet(
        packed.select("doc_id", "text", "lang", "source", "n_words", "bin"),
        f"{out_dir}/curated.parquet",
        partition_by=["lang"],
    )
    print(
        f"ingested={n0} quality_pass={n1} dsir_kept={n1b} exact_deduped={n2} "
        f"prefix_deduped={n2b} segment_deduped={n2c} near_deduped={n3} "
        f"decontaminated={n4} "
        f"bins={packed.select('bin').distinct().count()} "
        f"quarantined={quarantined.count()} -> {path}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
