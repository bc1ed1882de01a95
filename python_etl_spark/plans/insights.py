"""Round-4 plans: customer/product analytics, corpus-curation
additions, and the delivery scorecard.

Families in this module (each query's docstring carries its own scale
posture):

* Product analytics — ``events_rfm_segments`` (RFM quartile
  segmentation), ``events_user_lifespan`` (per-user tenure/activity),
  ``events_burst_minutes`` (rate-anomaly minutes).
* Relational reporting — ``etl_decile_report`` (ntile decile stats),
  ``q24_supplier_delivery_scorecard`` (late-shipment rates).
* Corpus curation — ``text_prefix_dedup`` (boilerplate-prefix
  fingerprint dedup, the RefinedWeb-style cheap pre-pass before
  MinHash), ``text_token_len_stats`` (per-language token-length
  distribution for mixture/length curation).

Cross-engine exactness follows plans/common.py: decimal sums, 6-decimal
rounds before comparison, md5 fingerprints both engines can rebuild.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_etl_spark.functions.exact import davg_sql, dsum, dsum_sql
from python_etl_spark.plans.common import register
from python_etl_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ------------------------------ RFM segments ------------------------------
@register(
    "events_rfm_segments",
    oracle="""
WITH anchor AS (SELECT MAX(ts) AS mx FROM events),
rfm AS (
  SELECT user_id,
    date_diff('day', MAX(ts), (SELECT mx FROM anchor)) AS recency_days,
    COUNT(*) AS frequency,
    CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS monetary
  FROM events GROUP BY user_id),
q AS (
  SELECT user_id, recency_days, frequency, monetary,
    NTILE(4) OVER (ORDER BY recency_days, user_id) AS r_q,
    NTILE(4) OVER (ORDER BY frequency DESC, user_id) AS f_q,
    NTILE(4) OVER (ORDER BY monetary DESC, user_id) AS m_q
  FROM rfm)
SELECT r_q, f_q, m_q, COUNT(*) AS n_users,
  ROUND(CAST(SUM(CAST(monetary AS DECIMAL(28,6))) AS DOUBLE)
        / COUNT(*), 6) AS avg_monetary
FROM q GROUP BY r_q, f_q, m_q
""",
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: quartile-bucket every user by recency,
    frequency, and monetary value, then profile the segments — the
    classic CRM cut. The raw stream collapses to one row per user
    FIRST (one partial-agg shuffle); the three NTILE windows then run
    over the small per-user frame, not the event stream. At 100 TB the
    per-user frame is |users| rows — if even that is too big for a
    global window, swap NTILE for percentile-bound buckets
    (etl_decile_report shows the window form; operators/ranking.py has
    the partition-parallel form). Deterministic via user_id
    tie-breaks."""
    ev = _t(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("mx"))
    rfm = (
        ev.groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("frequency"),
            dsum("value").alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            F.datediff(F.to_date("mx"), F.to_date("last_ts")).alias(
                "recency_days"
            ),
            "frequency",
            "monetary",
        )
    )
    r_w = Window.orderBy("recency_days", "user_id")
    f_w = Window.orderBy(F.desc("frequency"), F.asc("user_id"))
    m_w = Window.orderBy(F.desc("monetary"), F.asc("user_id"))
    q = rfm.select(
        "monetary",
        F.ntile(4).over(r_w).alias("r_q"),
        F.ntile(4).over(f_w).alias("f_q"),
        F.ntile(4).over(m_w).alias("m_q"),
    )
    return q.groupBy("r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(dsum("monetary") / F.count(F.lit(1)), 6).alias(
            "avg_monetary"
        ),
    )


# ----------------------------- decile report ------------------------------
@register(
    "etl_decile_report",
    oracle=f"""
WITH d AS (
  SELECT o_totalprice,
    NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders)
SELECT decile, COUNT(*) AS n_orders,
  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
  ROUND({davg_sql('o_totalprice')}, 6) AS avg_price,
  ROUND({dsum_sql('o_totalprice')}, 2) AS total_value
FROM d GROUP BY decile
""",
)
def etl_decile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile banding of order value — the distribution report every
    revenue dashboard starts with. NTILE(10) over a global order: at
    test scale a plain window; the deterministic o_orderkey tie-break
    makes bucket edges engine-identical. At 100 TB use
    operators/ranking.global_rank (range-partitioned, no single
    partition) and derive the decile in closed form — same output,
    documented swap."""
    o = _t(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    d = o.select(
        "o_totalprice", F.ntile(10).over(w).alias("decile")
    )
    return d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.round(
            dsum("o_totalprice") / F.count(F.lit(1)), 6
        ).alias("avg_price"),
        F.round(dsum("o_totalprice"), 2).alias("total_value"),
    )


# ----------------------------- user lifespan ------------------------------
@register(
    "events_user_lifespan",
    oracle="""
SELECT user_id,
  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_seen,
  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_seen,
  date_diff('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE))
    AS span_days,
  COUNT(DISTINCT strftime(ts, '%Y-%m-%d')) AS active_days,
  COUNT(*) AS n_events
FROM events GROUP BY user_id
""",
)
def events_user_lifespan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lifespan: first/last activity, calendar span, distinct
    active days, volume — the churn-model feature block. One groupBy
    shuffle on user_id; COUNT(DISTINCT day) rewrites to a two-level
    aggregate (partial per (user, day), then per user) in both
    engines. Timestamps emit as second-precision strings so the
    comparison is representation-independent."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "first_seen"
        ),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "last_seen"
        ),
        F.datediff(F.to_date(F.max("ts")), F.to_date(F.min("ts"))).alias(
            "span_days"
        ),
        F.countDistinct(F.date_format("ts", "yyyy-MM-dd")).alias(
            "active_days"
        ),
        F.count(F.lit(1)).alias("n_events"),
    )


# ----------------------------- prefix dedup -------------------------------
_PREFIX_TOKENS = 16


@register(
    "text_prefix_dedup",
    oracle=f"""
WITH fp AS (
  SELECT doc_id,
    md5(array_to_string(string_split(text, ' ')[1:{_PREFIX_TOKENS}], ' '))
      AS prefix_fp
  FROM documents)
SELECT prefix_fp, MIN(doc_id) AS keeper_doc_id,
  COUNT(*) AS n_docs
FROM fp GROUP BY prefix_fp HAVING COUNT(*) > 1
""",
)
def text_prefix_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-fingerprint dedup: md5 of the first 16 tokens groups
    docs sharing a boilerplate opening (the RefinedWeb-style cheap
    pre-pass that catches templated pages before MinHash spends real
    money). Pure narrow map + one partial-agg-friendly groupBy on a
    16-byte key; at 100 TB this is the first filter in the dedup
    cascade because it costs one scan."""
    docs = _t(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id",
        F.md5(
            F.encode(
                F.concat_ws(
                    " ",
                    F.slice(F.split("text", " ", -1), 1, _PREFIX_TOKENS),
                ),
                "UTF-8",
            )
        ).alias("prefix_fp"),
    )
    return (
        fp.groupBy("prefix_fp")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .where(F.col("n_docs") > 1)
    )


# --------------------------- token length stats ---------------------------
@register(
    "text_token_len_stats",
    oracle="""
WITH t AS (
  SELECT lang, len(string_split(text, ' ')) AS n_tokens FROM documents)
SELECT lang, COUNT(*) AS n_docs,
  ROUND(CAST(SUM(CAST(n_tokens AS DECIMAL(28,6))) AS DOUBLE)
        / COUNT(*), 6) AS avg_tokens,
  ROUND(quantile_cont(n_tokens, 0.5), 6) AS p50_tokens,
  ROUND(quantile_cont(n_tokens, 0.95), 6) AS p95_tokens,
  MAX(n_tokens) AS max_tokens
FROM t GROUP BY lang
""",
)
def text_token_len_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length distribution per language — the length-curation
    input (Gopher-style length filters pick their thresholds from
    exactly this table). One narrow tokenize + one groupBy on lang;
    exact interpolating percentiles at test scale, with
    percentile_approx as the documented single-pass swap at 100 TB."""
    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        "lang", F.size(F.split("text", " ", -1)).alias("n_tokens")
    )
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(dsum("n_tokens") / F.count(F.lit(1)), 6).alias(
            "avg_tokens"
        ),
        F.round(F.expr("percentile(n_tokens, 0.5)"), 6).alias("p50_tokens"),
        F.round(F.expr("percentile(n_tokens, 0.95)"), 6).alias(
            "p95_tokens"
        ),
        F.max("n_tokens").alias("max_tokens"),
    )


# ----------------------------- burst minutes ------------------------------
@register(
    "events_burst_minutes",
    oracle="""
WITH per_min AS (
  SELECT strftime(ts, '%Y-%m-%d %H:%M') AS minute, COUNT(*) AS cnt
  FROM events GROUP BY minute),
stats AS (
  SELECT AVG(cnt) AS mu, stddev_pop(cnt) AS sigma FROM per_min)
SELECT minute, cnt,
  ROUND((cnt - mu) / sigma, 6) AS zscore
FROM per_min CROSS JOIN stats
WHERE cnt > mu + 3 * sigma
""",
)
def events_burst_minutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-burst detection: minutes whose event count exceeds the
    global mean by 3 sigma — the ops-alerting primitive. The stream
    collapses to per-minute counts first (partial-agg shuffle to
    |minutes| rows); mean/stddev are a 1-row aggregate broadcast back.
    AVG over exact integer counts is engine-identical; no decimal
    scaffolding needed."""
    ev = _t(spark, sf_dir, "events")
    per_min = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("minute")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    stats = per_min.agg(
        F.avg("cnt").alias("mu"), F.stddev_pop("cnt").alias("sigma")
    )
    return (
        per_min.crossJoin(F.broadcast(stats))
        .where(F.col("cnt") > F.col("mu") + 3 * F.col("sigma"))
        .select(
            "minute",
            "cnt",
            F.round((F.col("cnt") - F.col("mu")) / F.col("sigma"), 6).alias(
                "zscore"
            ),
        )
    )


# ------------------------ supplier delivery scorecard ---------------------
_LATE_DAYS = 60


@register(
    "q24_supplier_delivery_scorecard",
    oracle=f"""
WITH lag AS (
  SELECT l_suppkey,
    date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
      AS lag_days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
SELECT s_suppkey, s_name, COUNT(*) AS n_shipments,
  CAST(SUM(CASE WHEN lag_days > {_LATE_DAYS} THEN 1 ELSE 0 END)
    AS BIGINT) AS n_late,
  ROUND(CAST(SUM(CASE WHEN lag_days > {_LATE_DAYS} THEN 1 ELSE 0
    END) AS DOUBLE) / COUNT(*), 6) AS late_rate,
  ROUND({davg_sql("lag_days")}, 6) AS avg_lag_days
FROM lag JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_suppkey, s_name
HAVING COUNT(*) >= 10
""",
)
def q24_supplier_delivery_scorecard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Supplier delivery scorecard: order-to-ship lag and the rate of
    shipments slower than 60 days, per supplier — the vendor-SLA
    report. The lineitem-orders join shuffles only the pruned
    (l_orderkey, l_suppkey, l_shipdate) columns; the supplier dim then
    attaches via broadcast (KBs at any SF); one partial-agg-friendly
    groupBy on s_suppkey."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    lag = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_suppkey",
        F.datediff(
            F.to_date("l_shipdate"), F.to_date("o_orderdate")
        ).alias("lag_days"),
    )
    late_flag = F.when(F.col("lag_days") > _LATE_DAYS, 1).otherwise(0)
    return (
        lag.join(F.broadcast(s), lag.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.count(F.lit(1)).alias("n_shipments"),
            F.sum(late_flag).cast("long").alias("n_late"),
            F.round(
                F.sum(late_flag).cast("double") / F.count(F.lit(1)), 6
            ).alias("late_rate"),
            F.round(
                dsum("lag_days") / F.count(F.lit(1)), 6
            ).alias("avg_lag_days"),
        )
        .where(F.col("n_shipments") >= 10)
    )
