"""DuckDB-hash-checkable twins of the approximate ANN / sketch plans.

The production ANN / near-dup operators use xxhash64 remixes or numpy
Gaussian hyperplanes — fast, but not expressible in ANSI SQL, so the
driver can only give them a rows-only check. Each ``*_checked`` twin
here swaps exactly the non-portable ingredient for an md5-derived one
(the trick proven by ``dedup_minhash_lsh_checked``) while keeping the
production plan SHAPE — bucketed candidate generation, candidate-only
verification, windowed top-k — so the ENTIRE pipeline is hash-checked
against DuckDB end to end.

Cross-engine determinism:

* Hyperplanes are Rademacher (+1/-1) weights derived from md5 hex
  digits — ``hashlib.md5`` on the Spark driver, ``md5()`` in DuckDB
  SQL; both hash the same bytes, so both engines build the SAME planes.
* Every plane dot product is ROUNDED to 6 decimals before the sign
  test in both engines, so the ~1e-15 summation-order jitter between
  engines cannot flip a bucket bit.
* All bucket / fingerprint math is integer arithmetic — exact.
* Exact-cosine verification reuses the package-wide round-to-6 +
  id-tiebreak convention (functions/vector.py).

Scale posture is identical to the production twins: candidates come
from bucket equijoins (never all-pairs), verification touches
candidates only, and the only non-Catalyst state is the tiny plane
matrix baked into the plan as literals.
"""

from __future__ import annotations

import hashlib
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_etl_spark.functions.vector import (
    as_double,
    cosine_from_parts,
    dot_exact,
    norm_sq_exact,
)
from python_etl_spark.plans.common import (
    AUG_VE_SQL,
    augmented_embeddings,
    register,
)
from python_etl_spark.plans.llm import _VE_SQL
from python_etl_spark.sources.tables import load_table

_DIM = 64


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ----------------------- md5 Rademacher hyperplanes -----------------------
def _rademacher(n_planes: int, dim: int, tag: str) -> list[list[float]]:
    """Plane p, dim i gets weight +1 iff the first hex digit of
    md5('{tag}{p}_{i}') is >= '8' — a Rademacher random hyperplane
    family (a valid sign-LSH for cosine) that DuckDB can rebuild with
    its own md5()."""
    return [
        [
            1.0
            if hashlib.md5(f"{tag}{p}_{i}".encode()).hexdigest()[0] >= "8"
            else -1.0
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


def _w_sql(n_planes: int, dim: int, tag: str, name: str) -> str:
    """DuckDB CTE rebuilding the same Rademacher weight table."""
    return f"""
{name} AS (
  SELECT p.p AS p, i.i AS i,
    CASE WHEN substr(md5('{tag}' || p.p || '_' || i.i), 1, 1) >= '8'
         THEN 1.0 ELSE -1.0 END AS w
  FROM range({n_planes}) p(p), range({dim}) i(i))"""


def _bucket_sql(w_name: str, out_name: str) -> str:
    """DuckDB CTE: ve x weights -> rounded plane dots -> packed bucket."""
    return f"""
{out_name}_d AS (
  SELECT ve.vec_id, {w_name}.p, ROUND(SUM(ve.x * {w_name}.w), 6) AS d
  FROM ve JOIN {w_name} ON {w_name}.i = ve.i
  GROUP BY ve.vec_id, {w_name}.p),
{out_name} AS (
  SELECT vec_id,
    CAST(SUM(CASE WHEN d > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
  FROM {out_name}_d GROUP BY vec_id)"""


def _bucket(vec: F.Column | str, planes: list[list[float]]) -> F.Column:
    """Spark mirror of _bucket_sql: sign bits of ROUNDED plane dots,
    packed into a long. Addition == OR over distinct powers of two.

    Column-name input assembles the whole expression as one SQL parse
    (the n_planes x dim F.lit py4j round trips dominated construction
    time — see operators/similarity.lsh_bucket); fold order, rounding
    and the CASE packing are identical, so buckets match the
    Column-input path and the DuckDB oracle bit-for-bit."""
    if isinstance(vec, str):
        terms = []
        for p, plane in enumerate(planes):
            arr = "array(" + ",".join(f"{float(x)!r}D" for x in plane) + ")"
            dot = (
                f"round(aggregate(zip_with({vec}, {arr}, (x, y) -> x * y), "
                "0.0D, (acc, x) -> acc + x), 6)"
            )
            terms.append(
                f"(CASE WHEN {dot} > 0 THEN CAST({1 << p} AS BIGINT) "
                "ELSE CAST(0 AS BIGINT) END)"
            )
        return F.expr(" + ".join(terms))
    bits = []
    for p, plane in enumerate(planes):
        arr = F.array(*[F.lit(x) for x in plane])
        dot = F.round(
            F.aggregate(
                F.zip_with(vec, arr, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )
        bits.append(
            F.when(dot > 0, F.lit(1 << p).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return reduce(lambda a, b: a + b, bits)


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


_EXACT_TOPK_SQL = """
dots AS (
  SELECT cand.query_id, cand.neighbor_id, SUM(a.x * b.x) AS dot
  FROM cand
  JOIN ve a ON a.vec_id = cand.query_id
  JOIN ve b ON b.vec_id = cand.neighbor_id AND b.i = a.i
  GROUP BY cand.query_id, cand.neighbor_id),
scored AS (
  SELECT dots.query_id, dots.neighbor_id,
    ROUND(dot / (sqrt(nq.nsq) * sqrt(nb.nsq)), 6) AS cosine
  FROM dots
  JOIN nrm nq ON nq.vec_id = dots.query_id
  JOIN nrm nb ON nb.vec_id = dots.neighbor_id)
SELECT query_id, neighbor_id, cosine, rnk FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rnk
  FROM scored) ranked
WHERE rnk <= 5
"""


# ------------------------------ sim_topk_lsh ------------------------------
_LSH_PLANES = 4


@register(
    "sim_topk_lsh_checked",
    oracle=f"""
WITH {_VE_SQL},
{_w_sql(_LSH_PLANES, _DIM, "lsh:", "w")},
{_bucket_sql("w", "bkt")},
cand AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM bkt q JOIN bkt c ON q.bucket = c.bucket
  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
{_EXACT_TOPK_SQL}
""",
)
def sim_topk_lsh_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sim_topk_lsh with md5-Rademacher hyperplanes instead of numpy
    Gaussians: same plan shape (sign-LSH bucket -> bucket equijoin ->
    exact cosine -> windowed top-k), fully DuckDB-hash-checkable."""
    emb = _t(spark, sf_dir, "embeddings")
    planes = _rademacher(_LSH_PLANES, _DIM, "lsh:")
    v = emb.select(
        F.col("vec_id").alias("id"), as_double("embedding").alias("vec")
    ).select(
        "id",
        "vec",
        norm_sq_exact("vec").alias("nsq"),
        _bucket("vec", planes).alias("bucket"),
    )
    queries = v.where(F.col("id") < 10).select(
        F.col("id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("nsq").alias("qnsq"),
        "bucket",
    )
    corpus = v.select(
        F.col("id").alias("neighbor_id"),
        F.col("vec").alias("cvec"),
        F.col("nsq").alias("cnsq"),
        "bucket",
    )
    cos = cosine_from_parts(
        dot_exact("qvec", "cvec"), F.col("qnsq"), F.col("cnsq")
    )
    scored = (
        corpus.join(F.broadcast(queries), ["bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    return _topk(scored, k=5)


# ------------------------------ sim_topk_ivf ------------------------------
_IVF_PLANES = 4


@register(
    "sim_topk_ivf_checked",
    oracle=f"""
WITH {_VE_SQL},
{_w_sql(_IVF_PLANES, _DIM, "ivf:", "w")},
{_bucket_sql("w", "bkt")},
probes AS (
  SELECT vec_id,
    CASE WHEN j.j = 0 THEN bucket
         ELSE xor(bucket, CAST(1 << (j.j - 1) AS BIGINT)) END AS pb
  FROM bkt, range({_IVF_PLANES + 1}) j(j)
  WHERE vec_id < 10),
cand AS (
  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM probes p JOIN bkt c ON c.bucket = p.pb
  WHERE c.vec_id <> p.vec_id),
{_EXACT_TOPK_SQL}
""",
)
def sim_topk_ivf_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sim_topk_ivf's plan shape — inverted lists + multi-probe +
    candidate-only exact scoring — with the k-means coarse quantizer
    (not SQL-expressible) swapped for the deterministic md5-Rademacher
    sign quantizer: 2^planes inverted lists; each query probes its own
    list plus every Hamming-1 neighbor. Fully DuckDB-hash-checkable.

    Probe lists are distinct single-bit flips and every corpus vector
    lives in exactly one list, so candidates are naturally unique — no
    dedup shuffle."""
    emb = _t(spark, sf_dir, "embeddings")
    planes = _rademacher(_IVF_PLANES, _DIM, "ivf:")
    v = emb.select(
        F.col("vec_id").alias("id"), as_double("embedding").alias("vec")
    ).select(
        "id",
        "vec",
        norm_sq_exact("vec").alias("nsq"),
        _bucket("vec", planes).alias("bucket"),
    )
    probes = v.where(F.col("id") < 10).select(
        F.col("id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("nsq").alias("qnsq"),
        F.explode(
            F.array(
                F.col("bucket"),
                *[
                    F.col("bucket").bitwiseXOR(F.lit(1 << p).cast("long"))
                    for p in range(_IVF_PLANES)
                ],
            )
        ).alias("bucket"),
    )
    corpus = v.select(
        F.col("id").alias("neighbor_id"),
        F.col("vec").alias("cvec"),
        F.col("nsq").alias("cnsq"),
        "bucket",
    )
    cos = cosine_from_parts(
        dot_exact("qvec", "cvec"), F.col("qnsq"), F.col("cnsq")
    )
    scored = (
        corpus.join(F.broadcast(probes), ["bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    return _topk(scored, k=5)


# ------------------------- dedup_embedding_lsh ----------------------------
_EMB_TABLES = 2
_EMB_PLANES = 6


def _emb_lsh_cand_sql() -> str:
    parts = []
    for t in range(_EMB_TABLES):
        parts.append(
            f"SELECT a.vec_id AS vec_a, b.vec_id AS vec_b\n"
            f"  FROM t{t} a JOIN t{t} b "
            f"ON a.bucket = b.bucket AND a.vec_id < b.vec_id"
        )
    return " UNION ALL ".join(parts)


@register(
    "dedup_embedding_lsh_checked",
    oracle=f"""
WITH {AUG_VE_SQL},
{",".join(_w_sql(_EMB_PLANES, _DIM, f"emb{t}:", f"w{t}") for t in range(_EMB_TABLES))},
{",".join(_bucket_sql(f"w{t}", f"t{t}") for t in range(_EMB_TABLES))},
cand AS (SELECT DISTINCT vec_a, vec_b FROM ({_emb_lsh_cand_sql()}) u),
dots AS (
  SELECT cand.vec_a, cand.vec_b, SUM(a.x * b.x) AS dot
  FROM cand
  JOIN ve a ON a.vec_id = cand.vec_a
  JOIN ve b ON b.vec_id = cand.vec_b AND b.i = a.i
  GROUP BY cand.vec_a, cand.vec_b)
SELECT dots.vec_a, dots.vec_b,
  ROUND(dot / (sqrt(na.nsq) * sqrt(nb.nsq)), 6) AS cosine
FROM dots
JOIN nrm na ON na.vec_id = dots.vec_a
JOIN nrm nb ON nb.vec_id = dots.vec_b
WHERE ROUND(dot / (sqrt(na.nsq) * sqrt(nb.nsq)), 6) >= 0.9
""",
)
def dedup_embedding_lsh_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_embedding_lsh with md5-Rademacher tables: multi-table
    sign-LSH candidates + exact-cosine verification over the
    planted-twin augmented corpus (plans/common.py), end-to-end
    DuckDB-hash-checkable AND non-vacuous at every SF."""
    aug = augmented_embeddings(_t(spark, sf_dir, "embeddings"))
    v = aug.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    ).select("id", "vec", norm_sq_exact("vec").alias("nsq"))
    tables = [
        _rademacher(_EMB_PLANES, _DIM, f"emb{t}:") for t in range(_EMB_TABLES)
    ]
    buckets = v.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table"),
                        _bucket("vec", tables[t]).alias("bucket"),
                    )
                    for t in range(_EMB_TABLES)
                ]
            )
        ).alias("e"),
    ).select("id", "e.table", "e.bucket")
    a = buckets.select(F.col("id").alias("vec_a"), "table", "bucket")
    b = buckets.select(F.col("id").alias("vec_b"), "table", "bucket")
    cands = (
        a.join(b, ["table", "bucket"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    va = v.select(
        F.col("id").alias("vec_a"), F.col("vec").alias("xa"),
        F.col("nsq").alias("na"),
    )
    vb = v.select(
        F.col("id").alias("vec_b"), F.col("vec").alias("xb"),
        F.col("nsq").alias("nb"),
    )
    cos = cosine_from_parts(dot_exact("xa", "xb"), F.col("na"), F.col("nb"))
    return (
        cands.join(va, ["vec_a"])
        .join(vb, ["vec_b"])
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .where(F.col("cosine") >= 0.9)
    )


# ----------------------------- dedup_simhash ------------------------------
# 60-bit fingerprint: md5 hex digit b//4 contributes bit b%4 — DuckDB's
# signed BIGINT << overflows at bit 63, and 60 = 4 chunks x 15 bits keeps
# the Hamming<=3 pigeonhole while matching the selectivity of the 64-bit
# production sketch (32-bit was 35x too dense: 3.5M pairs at sf0.1).
_SH_BITS = 60
_SH_DIGITS = _SH_BITS // 4
_SH_CHUNKS = 4
_SH_CHUNK_BITS = _SH_BITS // _SH_CHUNKS
_SH_MAX_HAMMING = 3

_SH_DIGS = ",\n    ".join(
    f"strpos('0123456789abcdef', substr(h, {d + 1}, 1)) - 1 AS g{d}"
    for d in range(_SH_DIGITS)
)
_SH_VOTES = ",\n    ".join(
    f"SUM(CASE WHEN (g{b // 4} & {1 << (b % 4)}) <> 0 THEN 1 ELSE -1 END)"
    f" AS v{b}"
    for b in range(_SH_BITS)
)
_SH_FP = " + ".join(
    f"CASE WHEN v{b} > 0 THEN (CAST(1 AS BIGINT) << {b}) ELSE CAST(0 AS BIGINT) END"
    for b in range(_SH_BITS)
)


@register(
    "dedup_simhash_checked",
    oracle=f"""
WITH toks AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
    FROM documents) q),
hs AS (SELECT doc_id, md5(tok) AS h FROM toks),
digs AS (
  SELECT doc_id,
    {_SH_DIGS}
  FROM hs),
votes AS (
  SELECT doc_id,
    {_SH_VOTES}
  FROM digs GROUP BY doc_id),
fp AS (SELECT doc_id, {_SH_FP} AS f FROM votes),
chunks AS (
  SELECT doc_id, f, c.i AS chunk_no,
    (f >> (c.i * {_SH_CHUNK_BITS})) & {(1 << _SH_CHUNK_BITS) - 1} AS chunk
  FROM fp, range({_SH_CHUNKS}) c(i))
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(bit_count(xor(a.f, b.f)) AS INT) AS hamming
FROM chunks a JOIN chunks b
  ON a.chunk_no = b.chunk_no AND a.chunk = b.chunk AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.f, b.f)) <= {_SH_MAX_HAMMING}
""",
)
def dedup_simhash_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_simhash with the xxhash64 token hash swapped for md5 hex
    digits: bit b of a token's sketch vote is bit b%4 of hex digit b//4
    of md5(tok). 60-bit fingerprint (DuckDB BIGINT << caps at 62),
    4x15-bit chunk pigeonhole (Hamming <= 3 guarantees a shared chunk),
    bit_count verify BEFORE the dedup shuffle — the production plan
    shape, fully DuckDB-hash-checkable. Integer votes/packing are exact
    in both engines; no float crosses the engine boundary."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(
            F.array_distinct(F.split(F.col("text"), " ", -1))
        ).alias("tok"),
    ).withColumn("h", F.md5(F.encode(F.col("tok"), "UTF-8")))
    digs = toks.select(
        "id",
        *[
            F.conv(F.substring("h", d + 1, 1), 16, 10)
            .cast("int")
            .alias(f"g{d}")
            for d in range(_SH_DIGITS)
        ],
    )
    votes = digs.groupBy("id").agg(
        *[
            F.sum(
                F.when(
                    F.col(f"g{b // 4}").bitwiseAND(F.lit(1 << (b % 4))) != 0,
                    1,
                ).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(_SH_BITS)
        ]
    )
    fp = reduce(
        lambda a, b: a + b,
        [
            F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            for b in range(_SH_BITS)
        ],
    )
    # sketches feed the chunk explode on both join sides: materialize
    # once, leak-free (see operators/dedup.py)
    sk = votes.select("id", fp.alias("f")).localCheckpoint(eager=True)
    chunks = sk.select(
        "id",
        "f",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_no"),
                        F.shiftrightunsigned(
                            F.col("f"), c * _SH_CHUNK_BITS
                        )
                        .bitwiseAND(F.lit((1 << _SH_CHUNK_BITS) - 1))
                        .alias("chunk"),
                    )
                    for c in range(_SH_CHUNKS)
                ]
            )
        ).alias("e"),
    ).select("id", "f", "e.chunk_no", "e.chunk")
    a = chunks.select(
        F.col("id").alias("doc_a"), F.col("f").alias("fa"), "chunk_no", "chunk"
    )
    b = chunks.select(
        F.col("id").alias("doc_b"), F.col("f").alias("fb"), "chunk_no", "chunk"
    )
    ham = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))).cast("int")
    return (
        a.join(b, ["chunk_no", "chunk"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .where(F.col("hamming") <= _SH_MAX_HAMMING)
        .distinct()
    )


# ------------------------- dedup_semantic_cluster -------------------------
# SemDeDup (Abbas et al., 2023): cluster the embedding space with a
# cheap coarse quantizer, then drop any vector that has a semantic
# near-duplicate (cosine >= tau) with a SMALLER id inside its own
# cluster — the quadratic search is confined to clusters, never the
# full corpus. Production would grow the cluster count ~O(sqrt(n))
# (the IVF k-means quantizer, operators/similarity.py); this checked
# twin fixes the md5-Rademacher sign quantizer (16 clusters) so the
# ENTIRE keep/drop decision is DuckDB-hash-checkable. Runs over the
# planted-twin augmented corpus, so it attests real drops at every SF.
_SEM_PLANES = 4
_SEM_TAU = 0.9


@register(
    "dedup_semantic_cluster",
    oracle=f"""
WITH {AUG_VE_SQL},
{_w_sql(_SEM_PLANES, _DIM, "sem:", "w")},
{_bucket_sql("w", "bkt")},
cand AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM bkt a JOIN bkt b ON a.bucket = b.bucket AND b.vec_id < a.vec_id),
dots AS (
  SELECT cand.va, cand.vb, SUM(a.x * b.x) AS dot
  FROM cand
  JOIN ve a ON a.vec_id = cand.va
  JOIN ve b ON b.vec_id = cand.vb AND b.i = a.i
  GROUP BY cand.va, cand.vb),
keep AS (
  SELECT va AS vec_id, MIN(vb) AS keeper_id
  FROM dots
  JOIN nrm na ON na.vec_id = dots.va
  JOIN nrm nb ON nb.vec_id = dots.vb
  WHERE ROUND(dot / (sqrt(na.nsq) * sqrt(nb.nsq)), 6) >= {_SEM_TAU}
  GROUP BY va)
SELECT bkt.vec_id AS vec_id, bkt.bucket AS cluster, keep.keeper_id,
  keep.keeper_id IS NOT NULL AS is_dropped
FROM bkt LEFT JOIN keep ON keep.vec_id = bkt.vec_id
""",
)
def dedup_semantic_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup keep/drop labels: every vector, its coarse cluster, and
    (if dropped) the smaller-id cluster-mate that semantically covers
    it. Cluster equijoin -> exact rounded cosine -> min-keeper
    aggregate -> left join back; the only shuffles are on the cluster
    id and vec_id, and verification touches within-cluster candidates
    only."""
    aug = augmented_embeddings(_t(spark, sf_dir, "embeddings"))
    planes = _rademacher(_SEM_PLANES, _DIM, "sem:")
    v = aug.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    ).select(
        "id",
        "vec",
        norm_sq_exact("vec").alias("nsq"),
        _bucket("vec", planes).alias("cluster"),
    )
    a = v.select(
        F.col("id").alias("vec_id"), F.col("vec").alias("xa"),
        F.col("nsq").alias("na"), "cluster",
    )
    b = v.select(
        F.col("id").alias("vb"), F.col("vec").alias("xb"),
        F.col("nsq").alias("nb"), "cluster",
    )
    cos = cosine_from_parts(dot_exact("xa", "xb"), F.col("na"), F.col("nb"))
    keep = (
        a.join(b, ["cluster"])
        .where(F.col("vb") < F.col("vec_id"))
        .select("vec_id", "vb", cos.alias("cosine"))
        .where(F.col("cosine") >= _SEM_TAU)
        .groupBy("vec_id")
        .agg(F.min("vb").alias("keeper_id"))
    )
    return (
        v.select(F.col("id").alias("vec_id"), "cluster")
        .join(keep, ["vec_id"], "left")
        .select(
            "vec_id",
            "cluster",
            "keeper_id",
            F.col("keeper_id").isNotNull().alias("is_dropped"),
        )
    )


# --------------------- in-engine ANN quality evaluation ---------------------


@register(
    "sim_eval_recall_lsh",
    oracle=f"""
WITH {_VE_SQL},
{_w_sql(_LSH_PLANES, _DIM, "lsh:", "w")},
{_bucket_sql("w", "bkt")},
exact_cand AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM (SELECT DISTINCT vec_id FROM ve WHERE vec_id < 10) q
  JOIN (SELECT DISTINCT vec_id FROM ve) c ON c.vec_id <> q.vec_id),
exact_dots AS (
  SELECT e.query_id, e.neighbor_id, SUM(a.x * b.x) AS dot
  FROM exact_cand e
  JOIN ve a ON a.vec_id = e.query_id
  JOIN ve b ON b.vec_id = e.neighbor_id AND b.i = a.i
  GROUP BY e.query_id, e.neighbor_id),
exact_top AS (
  SELECT query_id, neighbor_id FROM (
    SELECT d.query_id, d.neighbor_id,
      ROW_NUMBER() OVER (PARTITION BY d.query_id
        ORDER BY ROUND(dot / (sqrt(nq.nsq) * sqrt(nb.nsq)), 6) DESC,
                 d.neighbor_id) AS rnk
    FROM exact_dots d
    JOIN nrm nq ON nq.vec_id = d.query_id
    JOIN nrm nb ON nb.vec_id = d.neighbor_id) r
  WHERE rnk <= 5),
lsh_cand AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM bkt q JOIN bkt c ON q.bucket = c.bucket
  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
lsh_dots AS (
  SELECT e.query_id, e.neighbor_id, SUM(a.x * b.x) AS dot
  FROM lsh_cand e
  JOIN ve a ON a.vec_id = e.query_id
  JOIN ve b ON b.vec_id = e.neighbor_id AND b.i = a.i
  GROUP BY e.query_id, e.neighbor_id),
lsh_top AS (
  SELECT query_id, neighbor_id FROM (
    SELECT d.query_id, d.neighbor_id,
      ROW_NUMBER() OVER (PARTITION BY d.query_id
        ORDER BY ROUND(dot / (sqrt(nq.nsq) * sqrt(nb.nsq)), 6) DESC,
                 d.neighbor_id) AS rnk
    FROM lsh_dots d
    JOIN nrm nq ON nq.vec_id = d.query_id
    JOIN nrm nb ON nb.vec_id = d.neighbor_id) r
  WHERE rnk <= 5)
SELECT e.query_id,
  CAST(COUNT(*) AS BIGINT) AS n_exact,
  CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_hit,
  CAST(COUNT(l.neighbor_id) * 1000000 // COUNT(*) AS BIGINT)
    AS recall_ppm
FROM exact_top e
LEFT JOIN lsh_top l
  ON l.query_id = e.query_id AND l.neighbor_id = e.neighbor_id
GROUP BY e.query_id
""",
)
def sim_eval_recall_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation AS AN ENGINE QUERY: per-query recall@5 of
    the md5-Rademacher sign-LSH pipeline against the exact brute-force
    top-5, computed entirely in-engine (both rankings + the hit join)
    and hash-checked — the eval harness a retrieval team runs after
    every index build, expressed as one plan instead of a notebook.
    Integer-ppm recall; deterministic ranking ties throughout.

    Scale posture: the exact side is the quadratic baseline RESTRICTED
    to the 10 query rows (10 x N, not N^2 — the brute-force-per-query
    shape); the LSH side is the usual bucket equijoin; the final hit
    join runs on two 50-row frames."""
    emb = _t(spark, sf_dir, "embeddings")
    planes = _rademacher(_LSH_PLANES, _DIM, "lsh:")
    v = emb.select(
        F.col("vec_id").alias("id"), as_double("embedding").alias("vec")
    ).select(
        "id",
        "vec",
        norm_sq_exact("vec").alias("nsq"),
        _bucket("vec", planes).alias("bucket"),
    )
    queries = v.where(F.col("id") < 10).select(
        F.col("id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("nsq").alias("qnsq"),
        "bucket",
    )
    corpus = v.select(
        F.col("id").alias("neighbor_id"),
        F.col("vec").alias("cvec"),
        F.col("nsq").alias("cnsq"),
        "bucket",
    )
    cos = cosine_from_parts(
        dot_exact("qvec", "cvec"), F.col("qnsq"), F.col("cnsq")
    )
    exact_scored = (
        corpus.crossJoin(F.broadcast(queries.drop("bucket")))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    exact_top = _topk(exact_scored, k=5).select("query_id", "neighbor_id")
    lsh_scored = (
        corpus.join(F.broadcast(queries), ["bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    lsh_top = (
        _topk(lsh_scored, k=5)
        .select("query_id", F.col("neighbor_id").alias("hit_id"))
    )
    joined = exact_top.join(
        lsh_top,
        (exact_top["query_id"] == lsh_top["query_id"])
        & (exact_top["neighbor_id"] == lsh_top["hit_id"]),
        "left",
    ).select(exact_top["query_id"], "neighbor_id", "hit_id")
    return joined.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"),
        F.count("hit_id").cast("long").alias("n_hit"),
        F.expr(
            "CAST(count(hit_id) * 1000000 div count(1) AS BIGINT)"
        ).alias("recall_ppm"),
    )
