"""Semantic invariants for the round-3 curation / time-series plans
(hash-parity vs DuckDB is covered by test_oracle_parity.py — these
check the MEANING of the outputs)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from python_etl_spark.plans import QUERIES
from python_etl_spark.plans.common import PLANT_OFFSET
from python_etl_spark.sources.tables import load_table


def test_dsir_targets_score_higher(spark, sf_dir):
    """Importance weights must rank the target language (en) above the
    rest on average — the resampling signal DSIR exists to produce."""
    scored = QUERIES["text_dsir_importance"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    by_lang = (
        scored.join(docs, "doc_id")
        .groupBy(F.col("lang") == "en")
        .agg(F.avg("dsir_logweight").alias("m"))
        .collect()
    )
    means = {r[0]: r["m"] for r in by_lang}
    assert means[True] > means[False]
    # every doc with >= 2 tokens is scored
    n_docs = docs.count()
    assert scored.count() == n_docs


def test_semantic_cluster_drops_planted_twins(spark, sf_dir):
    """Every planted twin's only cosine>=0.9 neighbor is its source
    vector; whenever the quantizer co-clusters them the twin must be
    dropped with keeper == source. The sign quantizer can split a pair
    across clusters (that's the SemDeDup recall trade), so assert a
    high hit rate, and exact keeper identity for every hit."""
    out = QUERIES["dedup_semantic_cluster"](spark, sf_dir).collect()
    twins = [r for r in out if r.vec_id >= PLANT_OFFSET]
    assert twins, "augmented corpus must contain planted twins"
    dropped = [r for r in twins if r.is_dropped]
    assert len(dropped) >= 0.8 * len(twins)
    for r in dropped:
        assert r.keeper_id == r.vec_id - PLANT_OFFSET
    # keep/drop labels cover the full augmented corpus exactly once
    ids = [r.vec_id for r in out]
    assert len(ids) == len(set(ids))
    # a dropped vector's keeper always has a smaller id (keep-first rule)
    for r in out:
        if r.is_dropped:
            assert r.keeper_id < r.vec_id


def test_hypertable_rollup_hour_rows_sum_to_day(spark, sf_dir):
    out = QUERIES["events_hypertable_rollup"](spark, sf_dir)
    day = out.where(F.col("granularity") == "day").select(
        "event_type", "day", "n_events", "sum_value"
    )
    hour_sums = (
        out.where(F.col("granularity") == "hour")
        .groupBy("event_type", "day")
        .agg(
            F.sum("n_events").alias("h_events"),
            F.round(F.sum("sum_value"), 4).alias("h_value"),
        )
    )
    joined = day.join(hour_sums, ["event_type", "day"]).collect()
    assert joined
    for r in joined:
        assert r.n_events == r.h_events
        assert abs(r.sum_value - r.h_value) < 1e-6


def test_session_window_matches_event_totals(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    sess = QUERIES["stream_session_window_batch_equiv"](spark, sf_dir)
    agg = sess.agg(
        F.sum("n_events").alias("n"), F.count(F.lit(1)).alias("s")
    ).first()
    assert agg["n"] == ev.count()
    assert 0 < agg["s"] <= ev.count()
    # session span = (last event - first event) + 30 min gap
    bad = sess.where(
        F.col("session_end")
        < F.col("session_start") + F.expr("INTERVAL 30 MINUTES")
    ).count()
    assert bad == 0
    # sessions of the same user never overlap
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("session_start")
    overl = (
        sess.withColumn("prev_end", F.lag("session_end").over(w))
        .where(F.col("prev_end") > F.col("session_start"))
        .count()
    )
    assert overl == 0


def test_cume_dist_bounds_and_monotonicity(spark, sf_dir):
    out = QUERIES["win_cume_dist"](spark, sf_dir)
    assert out.where(
        (F.col("qty_cume_dist") <= 0) | (F.col("qty_cume_dist") > 1)
    ).count() == 0
    # max per partition is exactly 1
    mx = out.groupBy("l_returnflag").agg(
        F.max("qty_cume_dist").alias("m")
    ).collect()
    for r in mx:
        assert r["m"] == pytest.approx(1.0)
    # equal quantities share a value; higher quantity never has lower
    from pyspark.sql import Window

    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    viol = (
        out.withColumn("prev", F.lag("qty_cume_dist").over(w))
        .where(F.col("prev") > F.col("qty_cume_dist"))
        .count()
    )
    assert viol == 0


def test_grouping_sets_levels_reconcile(spark, sf_dir):
    out = QUERIES["etl_grouping_sets"](spark, sf_dir).collect()
    total = [r for r in out if r.level == "total"]
    assert len(total) == 1
    by_status = [r for r in out if r.level == "status"]
    by_priority = [r for r in out if r.level == "priority"]
    fine = [r for r in out if r.level == "status_priority"]
    for rows in (by_status, by_priority, fine):
        assert sum(r.n_orders for r in rows) == total[0].n_orders
        assert sum(r.sum_price for r in rows) == pytest.approx(
            total[0].sum_price, rel=1e-9
        )


def test_cms_estimates_bounded(spark, sf_dir):
    """Count-min guarantees: never underestimates, and overestimates by
    at most ~e/w * N (checked with 3x slack against the exact counts)."""
    import math

    from python_etl_spark.operators.dedup import _word_grams

    est = {
        r.g: r.est_count
        for r in QUERIES["text_cms_topk"](spark, sf_dir).collect()
    }
    assert len(est) == 20
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ", -1)
    grams = docs.select(toks.alias("t")).where(F.size("t") >= 3).select(
        F.explode(_word_grams(F.col("t"), 3)).alias("g")
    )
    exact = {
        r.g: r.c
        for r in grams.groupBy("g").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    n_total = sum(exact.values())
    slack = 3 * math.e / 1024 * n_total
    for g, e in est.items():
        assert e >= exact[g], g
        assert e - exact[g] <= slack, (g, e, exact[g], slack)
    # the heaviest estimated hitter is the true heaviest hitter
    top_est = max(est, key=lambda g: (est[g], g))
    top_true = max(exact, key=lambda g: (exact[g], g))
    assert est[top_est] >= exact[top_true]


def test_interval_join_partition_invariance(spark, sf_dir):
    """The grid-bucketed interval join must return the identical pair
    set regardless of input partitioning (the dedup-free emission rule
    is a per-row predicate, not a partition-local one)."""
    from python_etl_spark.operators.range_join import interval_overlap_join

    ev = load_table(spark, sf_dir, "events")
    hour = F.expr("INTERVAL 1 HOUR")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id",
        F.col("ts").alias("ps"), (F.col("ts") + hour).alias("pe"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"), "user_id",
        F.col("ts").alias("cs"), (F.col("ts") + hour).alias("ce"),
    )
    results = []
    for nparts in (1, 7, 32):
        out = interval_overlap_join(
            p.repartition(nparts), c.repartition(nparts),
            ["user_id"], "ps", "pe", "cs", "ce",
        )
        results.append({(r.pid, r.cid) for r in out.collect()})
    assert results[0] == results[1] == results[2]
    assert results[0], "expected at least one overlapping pair"
    # no pair may appear twice (first-shared-bucket emission)
    rows = interval_overlap_join(
        p, c, ["user_id"], "ps", "pe", "cs", "ce"
    ).collect()
    assert len(rows) == len({(r.pid, r.cid) for r in rows})


def test_winsorize_bounds_respected(spark, sf_dir):
    out = QUERIES["etl_winsorize"](spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    bounds = {
        r.l_returnflag: (r.lo, r.hi)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", F.lit(0.05)).alias("lo"),
            F.percentile("l_extendedprice", F.lit(0.95)).alias("hi"),
        )
        .collect()
    }
    rows = out.collect()
    assert rows
    for r in rows:
        lo, hi = bounds[r.l_returnflag]
        assert lo <= r.price_winsorized <= hi
        if r.was_clipped:
            assert r.price_winsorized in (lo, hi)
        else:
            assert r.price_winsorized == r.l_extendedprice


def test_dau_wau_invariants(spark, sf_dir):
    rows = QUERIES["events_dau_wau"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.wau >= r.dau > 0
        assert 0 < r.stickiness <= 1
    ev = load_table(spark, sf_dir, "events")
    total_days = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("d")
    ).distinct().count()
    assert len(rows) == total_days


def test_partial_agg_merge_equals_direct(spark, sf_dir):
    merged = {
        r.o_orderstatus: (r.n_orders, r.sum_price, r.min_price, r.max_price)
        for r in QUERIES["etl_partial_agg_merge"](spark, sf_dir).collect()
    }
    o = load_table(spark, sf_dir, "orders")
    direct = {
        r.o_orderstatus: (r.n, r.s, r.mn, r.mx)
        for r in o.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
            .cast("double")
            .alias("s"),
            F.min("o_totalprice").alias("mn"),
            F.max("o_totalprice").alias("mx"),
        )
        .collect()
    }
    assert merged == direct


def test_cluster_size_dist_reconciles(spark, sf_dir):
    rows = QUERIES["dedup_cluster_size_dist"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert sum(r.cluster_size * r.n_clusters for r in rows) == docs.count()
    assert all(r.n_docs == r.cluster_size * r.n_clusters for r in rows)


def test_lsh_bucket_stats_reconcile(spark, sf_dir):
    """Bucket histogram must account for every (doc, band) assignment:
    sum(bucket_size * n_buckets) per band == number of docs."""
    rows = QUERIES["dedup_lsh_bucket_stats"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    by_band = {}
    for r in rows:
        by_band.setdefault(r.band, 0)
        by_band[r.band] += r.bucket_size * r.n_buckets
    assert set(by_band) == {0, 1, 2, 3}
    assert all(v == n for v in by_band.values())


def test_heatmap_reconciles_to_total(spark, sf_dir):
    rows = QUERIES["events_heatmap_hour_dow"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    assert sum(r.n_events for r in rows) == ev.count()
    for r in rows:
        assert 0 <= r.dow <= 6 and 0 <= r.hr <= 23


def test_market_basket_lift_consistency(spark, sf_dir):
    rows = QUERIES["q23_market_basket"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.part_a < r.part_b
        assert r.together >= 3
        assert r.lift > 0


def test_percent_of_total_sums_to_one(spark, sf_dir):
    out = QUERIES["win_percent_of_total"](spark, sf_dir)
    sums = out.groupBy("o_orderstatus").agg(
        F.sum("pct_of_status").alias("s")
    ).collect()
    for r in sums:
        assert abs(r.s - 1.0) < 1e-6


def test_rows_only_queries_all_have_exactness_tests():
    """Registry invariant: a query may skip the DuckDB oracle ONLY if
    it is an approximate operator with an exact pytest reference. This
    guard fails when someone registers a new no-oracle query without
    adding it here (and without a corresponding exactness test)."""
    from python_etl_spark.plans import ORACLES, QUERIES

    ROWS_ONLY_WITH_PYTEST_ORACLE = {
        # approximate op               -> exactness test
        "dedup_minhash_lsh",     # test_dedup: vs exact Jaccard
        "dedup_simhash",         # test_dedup: hamming vs exact
        "events_audience_overlap_hll",  # test_hll_overlap: 8%-of-union bound
        "dedup_embedding_lsh",   # test_similarity: recall/precision
        "sim_topk_lsh",          # test_similarity: recall >= 0.8
        "sim_topk_ivf",          # test_similarity: recall >= 0.8
        "sim_topk_pq",           # test_similarity: recall >= 0.8
        "sim_topk_ivfpq",        # test_similarity: recall >= 0.8
        "emb_pca_variance",      # test_similarity: eig vs numpy.cov
        "etl_approx_distinct",   # test_scale_ops: HLL error bound
        "etl_approx_quantiles",  # test_scale_ops: value-band vs exact
        "text_cms_topk",         # test_curation: CMS over/under bounds
        "text_bpe_tokens",       # test_bpe: vs pure-Python reference
        "text_unigram_lm_tokens",  # test_web: vs pure-Python reference
    }
    rows_only = set(QUERIES) - set(ORACLES)
    assert rows_only == ROWS_ONLY_WITH_PYTEST_ORACLE, (
        "no-oracle queries changed; update the exactness-test map "
        f"(diff: {rows_only ^ ROWS_ONLY_WITH_PYTEST_ORACLE})"
    )


def test_decimal_sums_partition_invariant(spark, sf_dir):
    """The package-wide exactness claim, exercised: float-aggregating
    queries must produce IDENTICAL results under different shuffle
    partition counts (decimal addition is associative; double addition
    is not — a raw-double sum would flake here)."""
    names = [
        "q01_pricing_summary",
        "text_dsir_importance",
        "win_percent_of_total",
        "events_hypertable_rollup",
    ]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for nparts in ("3", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", nparts)
            for n in names:
                pdf = QUERIES[n](spark, sf_dir).toPandas()
                key = tuple(sorted(pdf.columns))
                canon = sorted(
                    tuple(str(v) for v in row)
                    for row in pdf[sorted(pdf.columns)].itertuples(index=False)
                )
                results.setdefault(n, []).append((key, canon))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    for n, runs in results.items():
        assert runs[0] == runs[1], f"{n} differs across partition counts"


def test_power_user_deciles_reconcile(spark, sf_dir):
    rows = QUERIES["events_power_users"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n_users for r in rows) == n_users
    assert abs(sum(r.value_share for r in rows) - 1.0) < 1e-4
    # deciles are value-ordered: share never increases down the curve
    ordered = sorted(rows, key=lambda r: r.decile)
    for a, b in zip(ordered, ordered[1:]):
        if a.n_users == b.n_users:  # equal-size buckets must be sorted
            assert a.decile_value >= b.decile_value


def test_benford_frequencies_reconcile(spark, sf_dir):
    rows = QUERIES["etl_benford_check"](spark, sf_dir).collect()
    assert {r.first_digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.observed_freq for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.benford_freq for r in rows) - 1.0) < 1e-3


def test_inter_event_gaps_reconcile(spark, sf_dir):
    rows = QUERIES["events_inter_event_time"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    per_user = {
        r.user_id: r.c
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    for r in rows:
        assert r.n_gaps == per_user[r.user_id] - 1
        assert r.min_gap_s <= r.median_gap_s <= r.p95_gap_s <= r.max_gap_s


def test_survey_section2_matches_registry():
    """SURVEY.md §2 is the coverage contract: every [O]/[R] entry must
    be a registered query and vice versa, [O] entries must carry a
    DuckDB oracle, [R] entries must not. Locks the doc to the code so
    count drift (the round-6 finding) cannot recur."""
    import re
    from pathlib import Path

    from python_etl_spark.plans import ORACLES, QUERIES

    text = Path(__file__).resolve().parent.parent.joinpath(
        "SURVEY.md"
    ).read_text()
    sec2 = text.split("## §2")[1].split("## §3")[0]
    tagged = re.findall(r"\[([OR])\]\s*`([a-z0-9_]+)`", sec2)
    o_names = {n for t, n in tagged if t == "O"}
    r_names = {n for t, n in tagged if t == "R"}
    assert o_names | r_names == set(QUERIES), sorted(
        (o_names | r_names) ^ set(QUERIES)
    )
    assert o_names == set(ORACLES), sorted(o_names ^ set(ORACLES))
    assert not (r_names & set(ORACLES)), sorted(r_names & set(ORACLES))
