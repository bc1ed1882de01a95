"""DSIR-style importance weighting (Xie et al., 2023, "Data Selection
for Language Models via Importance Resampling").

Score every document by how much more likely its hashed-bigram profile
is under a TARGET distribution than under the raw corpus — the signal
used to resample a crawl toward a target domain before training.

Scale posture: the per-bucket ratio table is ``n_buckets`` rows
(broadcast); the data-sized work is one partial-agg-friendly count
shuffle over the exploded bigram stream and one per-doc mean. The
md5-derived bucket hash and 6-decimal log-ratio rounds keep the whole
computation reproducible across engines (plans/curation.py hash-checks
it against DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from python_etl_spark.functions.exact import dsum


def hash_bucket(col: Column, n_buckets: int) -> Column:
    """Deterministic engine-portable feature-hash bucket: two md5 hex
    chars folded to an int (identical bytes hashed on any engine)."""
    h = F.md5(F.encode(col, "UTF-8"))
    return (
        (F.ascii(F.substring(h, 1, 1)) * 131 + F.ascii(F.substring(h, 2, 1)))
        % n_buckets
    ).cast("int")


def dsir_logweights(
    docs: DataFrame,
    is_target: Column,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """(id_col, n_bigrams, dsir_logweight) for every doc with >= 2
    tokens: mean log( p_target(bucket) / p_raw(bucket) ) over the doc's
    hashed bigrams, add-1 smoothed. Higher = more target-like."""
    from python_etl_spark.operators.dedup import _word_grams

    toks = F.split(F.col(text_col), " ", -1)
    bgb = (
        docs.select(id_col, is_target.alias("__t"), toks.alias("__toks"))
        .where(F.size("__toks") >= 2)
        .select(
            id_col, "__t", F.explode(_word_grams(F.col("__toks"), 2)).alias("b")
        )
        .select(id_col, "__t", hash_bucket(F.col("b"), n_buckets).alias("bucket"))
    )
    ct = bgb.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("rb"),
        F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("tb"),
    )
    tot = ct.agg(F.sum("rb").alias("rt"), F.sum("tb").alias("tt"))
    k = F.lit(float(n_buckets))
    lr = ct.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.round(
            F.log(
                ((F.col("tb") + 1.0) / (F.col("tt") + k))
                / ((F.col("rb") + 1.0) / (F.col("rt") + k))
            ),
            6,
        ).alias("lw"),
    )
    # The mean is computed ENTIRELY in integer micro-units: the decimal
    # sum of 6-decimal lw values is exact, and the division rounds
    # half-away-from-zero on integers. ROUND(double_sum / n, 6) here
    # would sit exactly on a decimal midpoint for ~1/10^4 docs (the
    # 6-decimal sum over n bigrams makes x.xxxxxx5 quotients common),
    # and binary doubles resolve that midpoint differently per engine —
    # measured 3/5000 flipped rows at sf0.1.
    return (
        bgb.join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            # stay DECIMAL until the integer cast: dsum's final
            # double cast would re-introduce binary rounding, and
            # double -> long truncates (251546.0 stored as
            # 251545.999... drops a micro-unit)
            (F.sum(F.col("lw").cast("decimal(28,6)")) * 1000000)
            .cast("long")
            .alias("__sm"),
        )
        .select(
            id_col,
            "n_bigrams",
            (
                F.expr(
                    "CAST(CASE WHEN __sm < 0 THEN "
                    "-((2 * -__sm + n_bigrams) div (2 * n_bigrams)) "
                    "ELSE (2 * __sm + n_bigrams) div (2 * n_bigrams) "
                    "END AS DOUBLE)"
                )
                / F.lit(1000000.0)
            ).alias("dsir_logweight"),
        )
    )
