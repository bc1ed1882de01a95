#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans for representative
queries, with the scale-relevant features annotated.

Usage: python scripts/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import io
import contextlib
import sys

sys.path.insert(0, ".")

SHOWCASE = {
    "q01_pricing_summary": "single scan -> partial agg -> final agg, all "
    "inside WholeStageCodegen; decimal sums keep the combine "
    "order-independent",
    "q05_local_supplier_volume": "6-way join: every dimension side is a "
    "BroadcastHashJoin — the 600k-row fact is shuffled exactly once "
    "(for the orders join) under AQE",
    "etl_filter_pushdown": "timestamp + numeric predicates reach the "
    "parquet scan (PushedFilters) and ReadSchema carries only the 3 "
    "projected columns",
    "etl_asof_join": "as-of join as union + single shuffle on user_id + "
    "window carry-forward: no range explosion",
    "dedup_minhash_lsh": "NARROW signature map (per-row min over the "
    "in-row shingle-hash array — zero shuffles to build sigs; the 64 "
    "min-remixes run in one vectorized Arrow/numpy kernel, bit-exact "
    "vs the Catalyst xxhash64 path) -> banded bucket self-join; "
    "candidates only, never n^2",
    "win_ntile": "global NTILE with NO Exchange SinglePartition: "
    "range-partition + per-partition row_number + broadcast offsets",
    "text_tfidf_topk": "tf and df from one exploded agg each, 1-row "
    "broadcast N, per-doc window — no global sort anywhere",
    "dedup_contamination": "benchmark shingle set DISTINCT-ed then "
    "broadcast; corpus scanned once (left join + one partial agg); "
    "the %97 filters push down to both parquet scans",
    "etl_sequence_pack": "global running total with NO Exchange "
    "SinglePartition: range partition + parallel prefix sums + "
    "broadcast offsets",
    "dedup_cluster_rep": "keep-one representative as ONE argmax "
    "aggregate (struct max): partial agg collapses duplicate groups "
    "map-side, no window, no sort",
    "etl_zscore_normalize": "decimal-exact moments (3 rows) broadcast "
    "back over a narrow scan — the 600k-row side never shuffles",
    "text_dsir_importance": "64-row hashed-bigram ratio table built by "
    "one collapsing partial agg, then BROADCAST onto the exploded "
    "bigram stream — no SortMergeJoin anywhere",
    "dedup_semantic_cluster": "SemDeDup: quadratic cosine search stays "
    "INSIDE clusters (equijoin on the quantizer bucket, no cartesian); "
    "keeper selection is one aggregate + a left join back",
    "events_hypertable_rollup": "Expand emits one row per granularity, "
    "partial HashAggregate collapses each level map-side, ONE exchange "
    "carries hour+day together",
    "dedup_containment": "session-shared sh-partitioned cached shingle "
    "frame (InMemoryRelation keeps hashpartitioning — no join-side "
    "exchanges); unordered a<b pair counts mirrored after aggregation "
    "halve the dominant shuffle; set sizes ride as a column (no sizes "
    "join)",
    "q23_market_basket": "fact-derived part frequencies attach via "
    "SHUFFLE join (no oversized broadcast at 100 TB); only the 1-row "
    "order count broadcasts into the cross join",
    "q25_nation_trade_balance": "two-path star join over one fact "
    "scan: both paths broadcast their dims and partial-aggregate to 25 "
    "nation rows before the full-outer stitch",
    "text_segment_dedup": "corpus-wide keep-first window partitioned "
    "by segment text with a PARTIAL WindowGroupLimit map-side: the "
    "shuffle carries at most one candidate winner per (segment, task), "
    "so a hot boilerplate segment cannot flood a reducer",
    "emb_random_projection": "ZERO exchanges: the 16x64 Rademacher "
    "matrix lives in the plan as literals and the whole projection + "
    "distortion report is one whole-stage-codegen projection",
    "etl_bloom_semi_join": "64Kbit bloom bitmap as a plan literal "
    "filters the fact map-side BEFORE the exchange; the exact semi "
    "join afterwards only sees candidates (FP rate <0.4% measured)",
    "graph_pagerank": "iterative Pregel shape: edges cached "
    "hash-partitioned on src (exchange-free join side every "
    "iteration), integer micro-unit contributions partial-aggregate "
    "map-side before the one grouped-sum shuffle per iteration; "
    "lineage truncated per round (eager localCheckpoint), rank "
    "vector spans src+dst with the dangling branch structurally "
    "skipped on symmetrized graphs",
    "events_audience_overlap_hll": "fact table collapses ONCE into "
    "|types| 1KB HLL sketches (mergeable partials, map-side "
    "combine); the pairwise inclusion-exclusion runs on the tiny "
    "sketch frame — facts never rescanned",
    "text_window_dup_fraction": "overlapping windows carry only "
    "their md5; window counts and the per-doc rollup are two "
    "partial-agg shuffles, and the count join reuses the same "
    "hash key the aggregate produced",
    "etl_incremental_load": "the registered query returns a "
    "materialized checkpoint (its scratch table is deleted), so the "
    "displayed plan is a single Scan ExistingRDD; the property that "
    "matters — the bookmark filter arriving as a pushed parquet "
    "predicate on the source scan — is CI-asserted in "
    "tests/test_incremental.py",
    "etl_zorder3_code": "k-way Morton interleave: 48 constant-shift "
    "OR terms inside one whole-stage-codegen projection, zero "
    "exchanges",
    "text_html_extract": "HTML->text extraction as ONE ArrowEvalPython "
    "map stage over the scan — zero exchanges; parser+boilerplate "
    "filter batch through Arrow, throughput scales with cores",
    "etl_url_blocklist_filter": "registered-domain suffix blocklist as "
    "a BroadcastNestedLoopJoin LeftAnti (non-equi): the URL side "
    "streams through with zero exchanges",
    "etl_url_host_dedup": "canonicalization is codegen string ops; the "
    "ONLY exchange is the keep-first partial agg on the canonical "
    "(host, path) key",
    "text_bpe_tokens_checked": "corpus touched by one (doc, word) "
    "partial-agg shuffle; the Arrow tokenizer runs over the tiny "
    "distinct-types frame whose counts BroadcastHashJoin back — "
    "Python work is O(#types), not O(corpus)",
    "etl_warc_ingest_stats": "pure map pipeline: binaryFile scan -> "
    "Arrow WARC decode -> projection; ZERO exchanges — ingest "
    "parallelism is the container count, the Common Crawl job shape",
    "text_exact_substr_dedup": "windows shuffle as hashes once "
    "(groupBy wh), the dup-window join reuses that key, covered "
    "positions roll up per doc (bounded by doc length), and "
    "reassembly is a JVM higher-order filter — no Python anywhere",
    "text_encoding_repair": "mojibake repair as ONE ArrowEvalPython "
    "map stage — zero exchanges, same shape as HTML extraction",
    "text_quality_fit_predict": "normal-equations fit: ONE global "
    "aggregation yields the 1-row moment/determinant frame (the only "
    "SinglePartition exchange), broadcast onto a zero-shuffle scoring "
    "map — weights never exist driver-side",
    "mm_image_ahash_dedup": "perceptual hash entirely in column "
    "algebra: pixel explode, per-doc mean, integer threshold bits, "
    "bit packing, keep-first — two partial-agg shuffles, no Python",
    "etl_leakage_safe_split": "iterative component labels (bounded "
    "rounds, checkpointed) + one left join + a zero-shuffle md5 split "
    "expression — cluster-cohesive assignment at corpus scale",
    "text_bm25_score": "scan-stage BM25: tf/df/dl as higher-order "
    "array filters (no explode), corpus stats reduce through the one "
    "SinglePartition merge and broadcast back — the only thing that "
    "crosses the cluster is a 1-row stats frame",
    "mm_audio_vad_segments": "decode + feature extraction fused in "
    "ONE ArrowEvalPython stage over the scan (binary payloads never "
    "cross an exchange); segmentation shuffles only (doc, frame, "
    "energy) scalars on the doc key",
    "mm_video_shot_detect": "zero Python: per-frame histograms, lag "
    "distance, cumulative shot numbering and stats all whole-stage "
    "codegen over doc-key windows",
    "emb_scalar_quantize": "SQ8: 128 min/max partials -> one "
    "broadcast stats row; codes and reconstruction errors are "
    "whole-stage array transforms in the scan stage — zero shuffles "
    "for the per-vector work",
    "events_markov_stationary": "power iteration on the constant-size "
    "transition frame: each step a key join + grouped integer sum; "
    "the corpus is touched once to build the chain",
    "etl_incremental_rollup": "the registered query returns the "
    "maintained VersionedTable state (a parquet snapshot read); the "
    "property that matters — each refresh reading ONLY the new "
    "commit's files — is CI-asserted on inputFiles() in "
    "tests/test_incremental.py",
    "events_audience_theta": "theta-sketch set algebra: ONE distinct "
    "shuffle over (type, member-hash) + the same-key ranking window "
    "build the K-row sketches; every union/intersect/diff estimate "
    "joins broadcast-sized frames — no cartesian, no single-partition "
    "window",
    "etl_partition_evolution": "mixed-layout snapshot read: flat "
    "pre-evolution dirs and hive post-evolution dirs conform per dir "
    "by CAST projection (no join, one aggregate exchange)",
    "etl_optimize_zorder": "post-Z-order range read: the residual "
    "custkey predicate reaches the parquet scan (PushedFilters) over "
    "the file subset the footer ranges admit",
    "sim_mmr_select": "re-ranker split: pool top-N and pairwise "
    "cosines distributed (broadcast joins), greedy selection on the "
    "bounded 20-row pool driver-side; the displayed plan is the "
    "createDataFrame of the selection trace",
    "etl_sql_merge_set": "column-subset MERGE readback: the "
    "assignments ran at WRITE time as one keyed full-outer join over "
    "touched dirs; the read is a plain snapshot aggregate (Catalyst "
    "parquet scans, no join, one aggregate exchange)",
    "etl_sql_copy_into": "COPY INTO readback: ingest-time file "
    "skipping is manifest metadata, invisible here — the plan is the "
    "committed dirs' parquet scans plus one aggregate exchange",
    "etl_identity_ids": "identity-id arithmetic readback: assignment "
    "was one O(#partitions) count agg + broadcast offsets join at "
    "write; the read buckets ids with a codegen CASE and aggregates "
    "(scan -> partial agg -> exchange -> final agg)",
    "etl_sql_txn": "transaction readback: PREPARE wrote each "
    "statement's data once, COMMIT was one coordinator-record "
    "create; the read is the two tables' snapshot scans unioned "
    "with one aggregate exchange each — the commit point never "
    "appears in a data plan",
    "etl_identity_by_default": "BY DEFAULT identity readback: "
    "explicit-id validation was one batch agg + a column-pruned "
    "below-water semi-join probe at write; the read is the same "
    "codegen CASE bucketing as the ALWAYS twin",
    "etl_sql_copy_evolve": "evolving COPY readback: PATTERN was a "
    "driver-side listing filter and evolution a manifest-recorded "
    "schema; the read conforms each dir by CAST inside the scan, "
    "then one aggregate exchange",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from python_etl_spark.plans import QUERIES
    from python_etl_spark.session import get_spark

    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")

    out = ["# PLANS — physical plans of representative queries",
           "",
           f"Generated by `scripts/dump_plans.py` at `{sf_dir}`. The",
           "features called out here are what make each plan survive a",
           "1000x scale-up (see SCALING.md).", ""]
    for name, note in SHOWCASE.items():
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # keep the operator tree; trim the verbose per-node detail
        tree = plan.split("\n\n")[0]
        out += [f"## {name}", "", f"*{note}*", "", "```", tree.rstrip(), "```", ""]
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(SHOWCASE)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
