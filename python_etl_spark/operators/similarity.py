"""Similarity search over embedding columns.

* brute_force_topk — exact cosine top-k; the query set is broadcast, so
  the scan over the corpus is embarrassingly parallel (no shuffle of
  the big side). Correctness baseline.
* lsh_bucketed_topk — random-hyperplane LSH: corpus and queries are
  bucketed by sign bits; only same-bucket candidates are scored. The
  100 TB path: candidate count per query is corpus/2^n_planes on
  average, and the bucket join is a plain shuffle join on the bucket id.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from python_etl_spark.functions.vector import (
    as_double,
    cosine_from_parts,
    dot_exact,
    norm_sq_exact,
)


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    v = embeddings.select(
        F.col(id_col).alias("id"), as_double(vec_col).alias("vec")
    ).select("id", "vec", norm_sq_exact("vec").alias("nsq"))
    queries = v.where(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("nsq").alias("qnsq"),
    )
    corpus = v.select(
        F.col("id").alias("neighbor_id"),
        F.col("vec").alias("cvec"),
        F.col("nsq").alias("cnsq"),
    )
    cos = cosine_from_parts(dot_exact("qvec", "cvec"), F.col("qnsq"), F.col("cnsq"))
    scored = (
        corpus.join(F.broadcast(queries))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def _hyperplanes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec_col: F.Column, planes: list[list[float]]) -> F.Column:
    """Pack sign(plane . vec) bits into a long bucket id (plain double
    fold — approximate path, no cross-engine parity needed)."""
    bits = []
    for p, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec_col, arr, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(
            F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    multi_probe: bool = False,
) -> DataFrame:
    """LSH ANN top-k. With ``multi_probe`` the query side additionally
    probes every bucket at Hamming distance 1 from its own (n_planes
    extra buckets per query): a large recall gain whose cost scales
    with the tiny query side — the corpus is never replicated."""
    dim = len(embeddings.select(vec_col).first()[0])
    planes = _hyperplanes(n_planes, dim, seed)
    v = embeddings.select(
        F.col(id_col).alias("id"), as_double(vec_col).alias("vec")
    ).select(
        "id",
        "vec",
        norm_sq_exact("vec").alias("nsq"),
        lsh_bucket(F.col("vec"), planes).alias("bucket"),
    )
    queries = v.where(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("nsq").alias("qnsq"),
        "bucket",
    )
    if multi_probe:
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(
                    F.shiftleft(F.lit(1).cast("long"), p)
                )
                for p in range(n_planes)
            ],
        )
        queries = queries.withColumn("bucket", F.explode(probes))
    corpus = v.select(
        F.col("id").alias("neighbor_id"),
        F.col("vec").alias("cvec"),
        F.col("nsq").alias("cnsq"),
        "bucket",
    )
    cos = cosine_from_parts(dot_exact("qvec", "cvec"), F.col("qnsq"), F.col("cnsq"))
    scored = (
        corpus.join(F.broadcast(queries), ["bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


# ------------------------------ IVF (coarse quantizer) --------------------
def _kmeans_centroids(
    v: DataFrame,
    n_centroids: int,
    iterations: int = 5,
) -> DataFrame:
    """Deterministic Lloyd iterations, DataFrame-only.

    Init: the n_centroids vectors with the smallest xxhash64(id) —
    deterministic, seed-free, spread pseudo-randomly. Each iteration:
    assign to nearest centroid (broadcast centroids), recompute means
    via posexplode + groupBy (one shuffle). Centroid count is small by
    design (sqrt(corpus) rule), so the broadcast is cheap.
    """
    init = (
        v.select("id", "vec", F.xxhash64(F.col("id").cast("string")).alias("h"))
        .orderBy("h")
        .limit(n_centroids)
        .select(F.col("id").alias("cid"), F.col("vec").alias("cvec"))
    )
    # stable small centroid ids 0..k-1
    centroids = init.select(
        (F.row_number().over(Window.orderBy("cid")) - 1).alias("cid"), "cvec"
    )
    for _ in range(iterations):
        assigned = _assign(v, centroids)
        centroids = (
            assigned.select("cid", F.posexplode("vec").alias("i", "x"))
            .groupBy("cid", "i")
            .agg(F.avg("x").alias("cx"))
            .groupBy("cid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("i", "cx"))
                ).alias("pairs")
            )
            .select(
                "cid",
                F.transform(F.col("pairs"), lambda p: p.cx).alias("cvec"),
            )
        )
    return centroids


def _assign(v: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest centroid per vector by dot/norm cosine, broadcast join."""
    c = F.broadcast(centroids)
    scored = v.join(c).select(
        "id",
        "vec",
        "cid",
        (
            dot_exact("vec", "cvec")
            / (F.sqrt(norm_sq_exact("vec")) * F.sqrt(norm_sq_exact("cvec")))
        ).alias("sim"),
    )
    w = Window.partitionBy("id").orderBy(F.desc("sim"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("id", "vec", "cid")
    )


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN: corpus partitioned into n_centroids inverted lists by a
    k-means coarse quantizer; each query probes its nprobe nearest
    lists only. Candidate fraction ~ nprobe/n_centroids of the corpus —
    the classic recall/cost dial. All DataFrame ops; centroids are the
    only broadcast state."""
    v = embeddings.select(
        F.col(id_col).alias("id"), as_double(vec_col).alias("vec")
    )
    centroids = _kmeans_centroids(v, n_centroids).cache()
    lists = _assign(v, centroids).select(
        "id", "vec", F.col("cid").alias("list_id"),
        norm_sq_exact("vec").alias("nsq"),
    )

    queries = v.where(F.col("id").isin(query_ids))
    qscored = queries.join(F.broadcast(centroids)).select(
        F.col("id").alias("query_id"),
        "vec",
        "cid",
        (
            dot_exact("vec", "cvec")
            / (F.sqrt(norm_sq_exact("vec")) * F.sqrt(norm_sq_exact("cvec")))
        ).alias("sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cid"))
    probes = (
        qscored.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select(
            "query_id",
            F.col("vec").alias("qvec"),
            norm_sq_exact("vec").alias("qnsq"),
            F.col("cid").alias("list_id"),
        )
    )
    cos = cosine_from_parts(dot_exact("qvec", "vec"), F.col("qnsq"), F.col("nsq"))
    scored = (
        lists.join(F.broadcast(probes), ["list_id"])
        .where(F.col("id") != F.col("query_id"))
        .select("query_id", F.col("id").alias("neighbor_id"), cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


# ------------------------- vectorized exact block scan --------------------
def _corpus_matrix(embeddings: DataFrame, vec_col: str, id_col: str):
    import numpy as np

    pdf = embeddings.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    norms = np.sqrt((m * m).sum(axis=1))
    return ids, m, norms


def knn_join_blocked(
    embeddings: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact kNN self-join via BLAS block matmul.

    The corpus matrix is broadcast (exact all-pairs is only sane when
    one side fits an executor — the approximate twins handle the rest);
    each Arrow batch computes a (batch x corpus) cosine block in one
    matmul instead of per-pair Catalyst lambda folds (~20x faster).
    Cosines are rounded to 6 decimals, matching the DuckDB oracle."""
    import numpy as np
    import pandas as pd

    ids, m, norms = _corpus_matrix(embeddings, vec_col, id_col)
    bc = embeddings.sparkSession.sparkContext.broadcast((ids, m, norms))

    def score(batches):
        c_ids, c_m, c_norms = bc.value
        for b in batches:
            q_ids = b[id_col].to_numpy()
            q = np.stack([np.asarray(v, dtype=np.float64) for v in b[vec_col]])
            q_norms = np.sqrt((q * q).sum(axis=1))
            s = np.round(
                (q @ c_m.T) / (q_norms[:, None] * c_norms[None, :]), 6
            )
            out_q, out_n, out_c, out_r = [], [], [], []
            for row, qid in enumerate(q_ids):
                sims = s[row]
                mask = c_ids != qid
                # sort by (-cosine, neighbor_id): lexsort keys reversed
                idx = np.lexsort((c_ids[mask], -sims[mask]))[:k]
                sel_ids = c_ids[mask][idx]
                sel_sims = sims[mask][idx]
                out_q.extend([qid] * len(idx))
                out_n.extend(sel_ids.tolist())
                out_c.extend(sel_sims.tolist())
                out_r.extend(range(1, len(idx) + 1))
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n,
                 "cosine": out_c, "rnk": out_r}
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        score, schema="query_id long, neighbor_id long, cosine double, rnk int"
    )


def near_dup_pairs_blocked(
    embeddings: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine near-dup pairs (a < b, cosine >= threshold) via the
    same broadcast block matmul."""
    import numpy as np
    import pandas as pd

    ids, m, norms = _corpus_matrix(embeddings, vec_col, id_col)
    bc = embeddings.sparkSession.sparkContext.broadcast((ids, m, norms))

    def score(batches):
        c_ids, c_m, c_norms = bc.value
        for b in batches:
            q_ids = b[id_col].to_numpy()
            q = np.stack([np.asarray(v, dtype=np.float64) for v in b[vec_col]])
            q_norms = np.sqrt((q * q).sum(axis=1))
            s = np.round(
                (q @ c_m.T) / (q_norms[:, None] * c_norms[None, :]), 6
            )
            a_col, b_col, c_col = [], [], []
            for row, qid in enumerate(q_ids):
                mask = (c_ids > qid) & (s[row] >= threshold)
                a_col.extend([qid] * int(mask.sum()))
                b_col.extend(c_ids[mask].tolist())
                c_col.extend(s[row][mask].tolist())
            yield pd.DataFrame(
                {"vec_a": a_col, "vec_b": b_col, "cosine": c_col}
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        score, schema="vec_a long, vec_b long, cosine double"
    )
