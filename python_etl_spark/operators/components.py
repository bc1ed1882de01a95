"""Connected components over near-duplicate pair graphs.

Near-dup detection yields PAIRS; choosing keepers needs GROUPS
(a~b, b~c => {a,b,c} keep one). This is iterative min-label
propagation: every node adopts the smallest id reachable in one hop,
repeated until fixpoint. Iterations = graph diameter (tiny for dedup
clusters); each iteration is two shuffles (groupBy min + join), and
intermediate lineage is truncated via localCheckpoint so plans don't
grow unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    left_col: str = "doc_a",
    right_col: str = "doc_b",
    max_iterations: int = 20,
) -> DataFrame:
    """pairs: undirected edges. Returns (id, component) where component
    is the minimum node id in each connected component."""
    edges = (
        pairs.select(
            F.col(left_col).alias("src"), F.col(right_col).alias("dst")
        )
        .union(
            pairs.select(
                F.col(right_col).alias("src"), F.col(left_col).alias("dst")
            )
        )
        .distinct()
        .cache()
    )
    # seed with the one-hop neighbor min: one aggregation replaces the
    # distinct-ids init AND the first propagation iteration (edges hold
    # both directions, so every node appears as src)
    labels = (
        edges.groupBy(F.col("src").alias("id"))
        .agg(F.min("dst").alias("nbr_min"))
        .select("id", F.least(F.col("id"), F.col("nbr_min")).alias("component"))
    )
    for _ in range(max_iterations):
        # single hop per materialization round: a 2-hop variant was
        # measured SLOWER at sf0.1 (deeper unmaterialized plans cost
        # more than the saved round — post-seed graphs converge in ~2
        # rounds anyway)
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        # carry the previous label through the checkpoint: convergence
        # detection is then a filter on materialized rows, not an extra
        # join-against-previous-labels job per iteration
        updated = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.col("component").alias("__prev"),
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
            )
        )
        # lazy checkpoint + full changed-count as the materializing
        # action: ONE job per iteration (the count touches every
        # partition, so every partition lands in the checkpoint) where
        # eager-checkpoint + separate limit(1) count was two
        updated = updated.localCheckpoint(eager=False)
        changed = (
            updated.where(F.col("component") != F.col("__prev")).count()
        )
        labels = updated.select("id", "component")
        if changed == 0:
            break
    edges.unpersist()
    return labels


def dedup_keepers(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    left_col: str = "doc_a",
    right_col: str = "doc_b",
) -> DataFrame:
    """Drop every doc that shares a component with a lower-id doc:
    the standard pairs -> groups -> keep-one dedup composition."""
    comp = connected_components(pairs, left_col, right_col)
    losers = comp.where(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    assume_distinct: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over a DIRECTED edge list (symmetrize
    first for undirected graphs). Returns (node, rank).

    The curation use-case is link-graph quality scoring (Common-Crawl
    style host ranking feeding a crawl-selection signal). Classic
    Pregel shape, expressed as DataFrame ops: per iteration one join
    (edges ⋈ ranks on src), one grouped sum (shuffle on dst), and one
    O(nodes) left join to re-attach rank-less nodes; lineage is
    truncated with an eager localCheckpoint per iteration — like
    connected_components, one materializing job each round, so plans
    stay shallow at any iteration count. The edge frame is cached
    src-partitioned for the loop and released after.

    General directed semantics: the rank vector covers EVERY node in
    src ∪ dst. Source-only nodes (out-edges, no in-edges) keep their
    (1-d)/n base term and keep contributing each round; sink/dangling
    nodes (no out-edges) have their mass redistributed uniformly — the
    standard dangling-node treatment, so total rank mass stays 1.0.
    The dangling term is a 1-row aggregate attached via broadcast
    crossJoin, never a driver round-trip.

    Exactness: per-source contributions rank/outdeg are IEEE doubles
    (identical cross-engine), quantized ONCE into integer units of
    1e-15 — the grouped sum is then 64-bit integer arithmetic, so
    aggregation order cannot move the result (and it is far faster
    than a Decimal128 sum); dangling mass is quantized the same way.
    The damped update returns to DOUBLE. Callers should round reported
    ranks (~6 decimals) when hash-comparing. On a symmetrized graph
    (no dangling nodes, every node in-linked) every added term is
    exactly 0.0 / a no-op, so results are bit-identical to the
    out-degree-only formulation the SQL oracle unrolls."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    if not assume_distinct:
        # duplicate edges would double-count contributions; pass
        # assume_distinct=True to skip this shuffle when the caller
        # already guarantees distinctness (e.g. symmetrized distinct
        # pairs over disjoint key spaces)
        e = e.distinct()
    e = e.repartition("src").persist()
    # deg is O(nodes) and consulted every iteration (contribution join
    # + dangling anti-join) — persist it so the 1e6+-edge aggregation
    # runs once, not per round
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).persist()
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    n_out = deg.count()  # materializes deg (and e underneath)
    # one-time structural check: a graph where every node has out-edges
    # (e.g. symmetrized) carries zero dangling mass — skip the
    # per-iteration anti-join + broadcast attach entirely
    has_dangling = n_out < n
    ranks = nodes.select(
        F.col("id").alias("src"), F.lit(1.0 / n).alias("rank")
    )
    for _ in range(iterations):
        per_src = ranks.join(deg, "src").select(
            "src",
            F.round((F.col("rank") / F.col("outdeg")) * 1e15, 0)
            .cast("long")
            .alias("c"),
        )
        contrib = (
            e.join(per_src, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("c").alias("in_c"))
        )
        base = F.lit((1.0 - damping) / n)
        in_term = (
            F.coalesce(F.col("in_c"), F.lit(0).cast("long")) / F.lit(1e15)
        )
        nxt = nodes.join(contrib, "id", "left")
        if has_dangling:
            # dangling mass: total rank sitting on nodes with no
            # out-edges, integer-quantized like the contributions;
            # 1 row, attached via broadcast — never a driver round-trip
            dang = ranks.join(deg, "src", "left_anti").agg(
                F.coalesce(
                    F.sum(F.round(F.col("rank") * 1e15, 0).cast("long")),
                    F.lit(0).cast("long"),
                ).alias("dang_c")
            )
            rank_expr = base + F.lit(damping) * (
                in_term + (F.col("dang_c") / F.lit(1e15)) / F.lit(float(n))
            )
            nxt = nxt.crossJoin(F.broadcast(dang))
        else:
            rank_expr = base + F.lit(damping) * in_term
        # lazy: the RDD still truncates lineage the moment it exists,
        # but materialization folds into the consumer's job instead of
        # paying one scheduling round per iteration (5 jobs saved;
        # ~0.8 s at sf0.1, results identical — fixed iteration count,
        # no convergence check to force a round boundary)
        ranks = nxt.select(
            F.col("id").alias("src"), rank_expr.alias("rank")
        ).localCheckpoint(eager=False)
    ranks = ranks.select(F.col("src").alias("node"), "rank")
    e.unpersist(blocking=False)
    deg.unpersist(blocking=False)
    nodes.unpersist(blocking=False)
    return ranks
