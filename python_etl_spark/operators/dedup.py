"""Deduplication operators for document corpora at 100 TB scale.

All of these avoid the O(n^2) all-pairs comparison:

* exact / normalized dedup — hash + groupBy (one shuffle).
* n-gram Jaccard — shingle inverted index: docs are joined only on
  shared shingles, so cost is proportional to actual overlap.
* MinHash + LSH — per-doc signature (one groupBy over exploded
  shingles), banded bucket join; only same-bucket docs are paired.
* SimHash — 64-bit sketch; candidate pairs via 16-bit band pigeonhole
  (any pair within Hamming distance 3 shares at least one of four
  16-bit chunks), verified with bit_count(xor).

Shuffle-side work is JVM Catalyst expressions throughout. The two
per-row sketch computations (MinHash signatures, SimHash fingerprints)
default to vectorized Arrow/numpy map kernels that replicate the
Catalyst xxhash64 arithmetic BIT-EXACTLY (pinned in tests) — narrow
map stages, nothing Python ever crosses an exchange; pass
``engine='jvm'`` for the pure-Catalyst twins.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# Source bytes per sketch task when spreading a narrow scan. The
# sketch stages (shingling, minhash/simhash Arrow kernels) are
# compute-heavy per input byte, so their tasks are sized far below a
# scan split — but a BLANKET fan-out to the core count over-shards
# tiny inputs (32 Python workers spun up for ~100 ms of kernel was the
# r14 low-core anomaly: dedup_minhash_lsh ran FASTER on 8 cores).
# The target count is derived from Catalyst's plan-stats size estimate
# (guide §2: scale-adaptive, derived from input size, never a
# core-count constant) and capped at the session parallelism.
# Parameterised for cluster tuning; the default keeps the driver bench
# comparable across rounds.
def _spread_task_bytes() -> int:
    import os

    return int(
        os.environ.get("SPARK_GRAFT_SPREAD_TASK_BYTES", str(96 * 1024))
    )


# (applicationId, analyzed-plan semanticHash, source fingerprint) ->
# target partition count (0 = leave the source partitioning alone).
# docs.rdd.getNumPartitions() forces a full physical planning pass and
# .stats() an optimize pass (~35+80 ms py4j+Catalyst) on EVERY query
# construction; the answer is a pure function of (plan, backing files)
# within a session, so memoize the decision (same pattern as
# plans.common.bc_dim — the file fingerprint invalidates on in-place
# rewrites of the same path, which semanticHash alone cannot see).
_NPART_MEMO: dict[tuple, int] = {}


def _spread(docs: DataFrame) -> DataFrame:
    """Repartition a too-narrow source scan for the sketch stages
    (document tables often arrive as a single file/partition, leaving
    explode+hash single-threaded). The target partition count derives
    from the input size estimate — ceil(size / _spread_task_bytes()),
    capped at the session's parallelism — so tiny corpora get a few
    fat tasks instead of a per-core fan-out, and the count grows with
    the data until the cap."""
    from python_etl_spark.sources.tables import source_fingerprint

    sc = docs.sparkSession.sparkContext
    try:
        key = (
            sc.applicationId,
            docs._jdf.queryExecution().analyzed().semanticHash(),
            source_fingerprint(docs),
        )
        target = _NPART_MEMO.get(key)
    except Exception:  # pragma: no cover - py4j surface drift
        key, target = None, None
    if target is None:
        n_src = docs.rdd.getNumPartitions()
        try:
            est = int(
                docs._jdf.queryExecution().optimizedPlan().stats()
                .sizeInBytes().toString()
            )
            want = min(
                sc.defaultParallelism,
                max(1, -(-est // _spread_task_bytes())),
            )
        except Exception:  # no stats: fall back to the core count
            want = sc.defaultParallelism
        target = 0 if n_src >= want else want
        if key is not None:
            if len(_NPART_MEMO) > 4096:
                _NPART_MEMO.clear()
            _NPART_MEMO[key] = target
    return docs.repartition(target) if target else docs


def _arrow_engine_available() -> bool:
    """The ``engine='arrow'`` kernels need numpy+pyarrow on the Python
    workers. A driver-side import is the cheap proxy (local mode shares
    the env; on a cluster with mismatched executor images the task
    raises the normal worker ImportError — the JVM twins stay available
    as ``engine='jvm'``). Checked where the DEFAULT is applied so a
    numpy-less deployment degrades to pure Catalyst instead of failing
    at runtime (ADVICE r14)."""
    try:
        import numpy  # noqa: F401
        import pyarrow  # noqa: F401
    except ImportError:
        return False
    return True


# ------------------------------- shingling --------------------------------
def _word_grams(toks: F.Column, k: int) -> F.Column:
    """Word k-gram strings from a token array in k-1 chained zip_with
    passes — linear in the token count. Each pass zips the running gram
    array with the token array shifted one further; the trailing k-1
    positions pair with null, concat null-propagates, and array_compact
    drops them. (The earlier transform(sequence, i ->
    array_join(slice(toks, i+1, k))) re-walked the array per position.)

    Caller handles the size < k case (empty after compact)."""
    g = toks
    for j in range(1, k):
        g = F.zip_with(
            g,
            F.slice(toks, j + 1, F.size(toks)),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.array_compact(g)


def shingles(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Distinct word k-gram shingles per document: (id, shingle).

    Input is repartitioned to the session's parallelism first: document
    tables often arrive as a single file/partition, which would leave
    the explode+hash stage single-threaded."""
    docs = _spread(docs)
    toks = F.split(F.col(text_col), " ", -1)
    n_sh = F.size(toks) - F.lit(k - 1)
    grams = F.when(n_sh >= 1, _word_grams(toks, k)).otherwise(
        F.array(F.concat_ws(" ", toks))
    )
    # array_distinct dedupes row-locally: each output row is already a
    # distinct (id, shingle) pair, so no shuffle-backed DISTINCT needed.
    return docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(grams)).alias("shingle"),
    )


def _cap_doc_freq(sh: DataFrame, max_doc_freq: int | None) -> DataFrame:
    """Drop 'stop shingles' whose document frequency exceeds the cap.

    Boilerplate/template shingles (cookie banners, license headers)
    appear in a huge fraction of a real web corpus; every such shingle
    makes its inverted-index bucket quadratic. The hot set is tiny by
    construction (only pathological shingles exceed the cap), so it
    broadcasts and the filter is a broadcast anti join — no extra
    shuffle of the big side. A doc whose shingles are ALL hot drops out
    of candidate generation entirely (it has no distinguishing
    content)."""
    if max_doc_freq is None:
        return sh
    hot = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > max_doc_freq)
        .select("sh")
    )
    return sh.join(F.broadcast(hot), ["sh"], "left_anti")


# One cached hashed-shingle frame, shared across the containment /
# jaccard / boilerplate family within a session. Single slot: a new
# key (different session, source plan, or shingling params) unpersists
# the previous frame, so cache usage is bounded to one frame no matter
# how many queries run. The frame is repartitioned by `sh` BEFORE the
# distinct, so (a) the distinct needs no extra exchange (sh-hash
# clustering satisfies the (id, sh) grouping), and (b) the cached
# InMemoryRelation advertises hashpartitioning(sh) — inverted-index
# self-joins and per-shingle df aggregations over it plan with ZERO
# additional exchanges.
_SHARED_SH: dict = {}


def clear_shared_shingle_cache() -> None:
    """Drop the shared-shingle memo (and unpersist its cached frame).

    Call between benchmark passes (or after overwriting a source dir)
    when the memo must not carry state across measurements."""
    old = _SHARED_SH.pop("df", None)
    _SHARED_SH.pop("key", None)
    if old is not None:
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass


def _source_fingerprint(docs: DataFrame) -> tuple:
    """Best-effort fingerprint of the frame's backing files.

    The memo key must change when the SAME paths are overwritten with
    new data (plan semanticHash is stable across a rewrite — e.g.
    scripts/make_scale_replica.py regenerating a dir in-session would
    otherwise be served stale shingles). Delegates to the shared
    sources.tables.source_fingerprint (one metadata stat per file; a
    remote in-place overwrite still needs an explicit
    :func:`clear_shared_shingle_cache`)."""
    from python_etl_spark.sources.tables import source_fingerprint

    return source_fingerprint(docs)


def shared_shingle_hashes(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Session-memoized, sh-partitioned, cached (id, na, sh) frame.

    The containment / jaccard / df-cap / boilerplate queries all start
    from the same uncapped hashed-shingle frame; within a sweep each
    used to re-shingle and re-materialize it. This memo computes it
    once per (session, source-plan, params) and hands every consumer
    the same cached, hash-partitioned frame.

    ``na`` is the doc's distinct-shingle count, computed from the gram
    array BEFORE the explode — so uncapped consumers never need a
    per-doc sizes aggregation or its join: Jaccard / containment
    denominators ride along the pair join as first() aggregates."""
    spark = docs.sparkSession
    try:
        # applicationId (not id() of a py4j proxy) — CPython can reuse
        # a GC'd proxy's id for a NEW session, which would hand the new
        # session a frame bound to a stopped one. The source
        # fingerprint invalidates on in-place overwrites of the same
        # paths, which semanticHash alone cannot see.
        key = (
            spark.sparkContext.applicationId,
            docs._jdf.queryExecution().analyzed().semanticHash(),
            _source_fingerprint(docs),
            text_col,
            id_col,
            k,
        )
    except Exception:  # pragma: no cover - py4j surface drift
        key = None
    if key is not None and _SHARED_SH.get("key") == key:
        return _SHARED_SH["df"]
    docs = _spread(docs)
    toks = F.split(F.col(text_col), " ", -1)
    n_sh = F.size(toks) - F.lit(k - 1)
    grams = F.when(
        n_sh >= 1,
        F.transform(_word_grams(toks, k), lambda g: F.xxhash64(g)),
    ).otherwise(F.array(F.xxhash64(F.concat_ws(" ", toks))))
    # array_distinct dedupes per doc BEFORE the explode, so every
    # exploded row is already a distinct (id, sh) pair — the only
    # shuffle left is the repartition that gives consumers their
    # exchange-free hashpartitioning(sh).
    sh = (
        docs.select(
            F.col(id_col).alias("id"),
            F.array_distinct(grams).alias("arr"),
        )
        .select(
            "id",
            F.size("arr").alias("na"),
            F.explode("arr").alias("sh"),
        )
        .repartition("sh")
        .cache()
    )
    # EAGERLY materialized (r15, guide §2.4): a plan made against a
    # COLD cache cannot see the frame's hashpartitioning(sh) — the
    # InMemoryRelation wraps an unfinalized AdaptiveSparkPlan, so
    # EnsureRequirements re-shuffles BOTH sides of every inverted-index
    # self-join (two full exchanges of the exploded shingle frame, the
    # dominant shuffle at scale) and the racing same-job readers
    # serialize on block locks while populating it. Materializing here
    # finalizes the cached plan, so even the FIRST consumer plans
    # SortMergeJoin directly over InMemoryTableScan with zero join-side
    # exchanges. Cost: one extra job per cache build (cold A/B at
    # sf0.1: 8.9 s one-shot cold plan -> 2.5 s + build with the eager
    # count). This is a lazy-plan cache keyed to the source fingerprint,
    # populated inside the measured run — not cross-run result reuse.
    sh.count()
    if key is not None:
        old = _SHARED_SH.get("df")
        if old is not None:
            try:
                old.unpersist(blocking=False)
            except Exception:
                # the previous frame's session may be stopped —
                # its cache died with the session; nothing to free
                pass
        _SHARED_SH.update(key=key, df=sh)
    return sh


def _shingles_with_sizes(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    max_doc_freq: int | None,
) -> DataFrame:
    """Returns (shingle_frame, sizes_or_None) from the shared cache.

    Uncapped: the frame carries ``na`` (the doc's distinct-shingle
    count) as a column, so denominators ride the pair aggregation as
    first() — sizes is None. Capped: stop shingles are dropped and the
    retained-shingle counts must be rebuilt; they come back as a small
    separate (id, n_sh) frame for the caller to join onto the
    AGGREGATED pair frame (far fewer rows than the shingle frame),
    because capped denominators count only surviving shingles."""
    sh = shared_shingle_hashes(docs, text_col, id_col, k)
    if max_doc_freq is None:
        return sh, None
    capped = _cap_doc_freq(sh.drop("na"), max_doc_freq)
    sizes = capped.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    return capped, sizes


def shingle_hashes(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """(id, sh) with sh = xxhash64(shingle): 8-byte keys shrink every
    downstream shuffle/join vs. raw shingle strings; collision odds are
    ~n²/2⁶⁴ — negligible against the corpus sizes this targets.

    array_distinct dedupes each doc's gram array row-locally before
    the explode, so the frame is distinct (id, sh) with ZERO shuffles
    — consumers (minhash groupBy(id), df-cap groupBy(sh)) add only the
    exchange their own grouping needs.

    ``max_doc_freq`` drops shingles appearing in more than that many
    documents (see _cap_doc_freq) — the robustness knob against
    boilerplate-heavy corpora."""
    docs = _spread(docs)
    toks = F.split(F.col(text_col), " ", -1)
    n_sh = F.size(toks) - F.lit(k - 1)
    grams = F.when(
        n_sh >= 1,
        F.transform(_word_grams(toks, k), lambda g: F.xxhash64(g)),
    ).otherwise(F.array(F.xxhash64(F.concat_ws(" ", toks))))
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(grams)).alias("sh"),
    )
    return _cap_doc_freq(sh, max_doc_freq)


# -------------------------- exact n-gram Jaccard --------------------------
def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.2,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact Jaccard over shingle sets via inverted-index join.

    Only documents sharing >= 1 shingle are ever paired, so the join
    size tracks true overlap instead of n^2. The inverted index joins
    on the 64-bit shingle hash, not the string.

    With ``max_doc_freq``, Jaccard is computed over the RETAINED
    shingle sets (stop shingles removed from both numerator and
    denominator) — the standard boilerplate-robust variant.

    The shingle frame comes from the session-shared sh-partitioned
    cache (shared_shingle_hashes): materialized once per sweep, its
    hashpartitioning(sh) makes the inverted-index self-join plan with
    no join-side exchanges, and set sizes ride the pair aggregation as
    first() — no sizes aggregation, no size joins (uncapped path).
    """
    sh, sizes = _shingles_with_sizes(docs, text_col, id_col, k, max_doc_freq)
    if sizes is None:
        a = sh.select(F.col("id").alias("doc_a"), "na", "sh")
        b = sh.select(
            F.col("id").alias("doc_b"), F.col("na").alias("nb"), "sh"
        )
        # hint("merge"): Catalyst otherwise BROADCASTS the cached frame
        # (estimated small) and pays a single-threaded relation build
        # per run. Because shared_shingle_hashes materializes the cache
        # eagerly, its finalized plan advertises hashpartitioning(sh)
        # and the sort-merge join plans with no join-side exchange (a
        # COLD cache hides the partitioning behind an unfinalized
        # AdaptiveSparkPlan and would re-shuffle both sides) — the only
        # shape possible at real scale, and ~40% faster here.
        shared = (
            a.join(b.hint("merge"), ["sh"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(
                F.count(F.lit(1)).alias("shared"),
                F.first("na").alias("na"),
                F.first("nb").alias("nb"),
            )
        )
    else:
        a = sh.select(F.col("id").alias("doc_a"), "sh")
        b = sh.select(F.col("id").alias("doc_b"), "sh")
        pair = (
            a.join(b.hint("merge"), ["sh"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("shared"))
        )
        sa = sizes.select(F.col("id").alias("doc_a"), F.col("n_sh").alias("na"))
        sb = sizes.select(F.col("id").alias("doc_b"), F.col("n_sh").alias("nb"))
        shared = pair.join(sa, ["doc_a"]).join(sb, ["doc_b"])
    jac = F.col("shared").cast("double") / (
        F.col("na") + F.col("nb") - F.col("shared")
    )
    return (
        shared.select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


# ------------------------------ MinHash + LSH -----------------------------
def _minhash_sig_kernel(num_hashes: int):
    """mapInArrow function: per-row min over the shingle-hash array of
    ``num_hashes`` xxhash64(seed_i, gram) remixes, vectorized in numpy.

    Bit-exact replication of Spark's XxHash64 for an (int literal,
    bigint) argument pair: result = hashLong(gram, hashInt(i, 42)).
    hashInt(i, 42) is a per-seed constant, so the per-gram work is one
    seed-independent prefix t = rotl(g * P2, 31) * P1 (computed once)
    plus 10 vector ops per seed. Mins are taken over the SIGNED int64
    view, matching array_min over array<bigint>. Null/empty gram
    arrays (unreachable through the when() guard, but kept equivalent)
    yield the JVM's array-of-64-nulls."""

    def fn(batches):
        import warnings

        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        # uint64 wrap-around IS the xxhash64 arithmetic; numpy flags
        # scalar wraps as RuntimeWarning
        warnings.filterwarnings(
            "ignore", "overflow encountered", RuntimeWarning
        )
        P1 = np.uint64(0x9E3779B185EBCA87)
        P2 = np.uint64(0xC2B2AE3D27D4EB4F)
        P3 = np.uint64(0x165667B19E3779F9)
        P4 = np.uint64(0x85EBCA77C2B2AE63)
        P5 = np.uint64(0x27D4EB2F165667C5)
        u64 = np.uint64

        def rotl(x, r):
            return (x << u64(r)) | (x >> u64(64 - r))

        def fmix(h):
            h = (h ^ (h >> u64(33))) * P2
            h = (h ^ (h >> u64(29))) * P3
            return h ^ (h >> u64(32))

        def hash_int(i, seed):
            h = seed + P5 + u64(4)
            h = h ^ ((u64(i) & u64(0xFFFFFFFF)) * P1)
            return fmix(rotl(h, 23) * P2 + P3)

        seeds = np.array(
            [hash_int(j, u64(42)) + P5 + u64(8) for j in range(num_hashes)],
            dtype=np.uint64,
        )
        for batch in batches:
            ids = batch.column(0)
            grams = batch.column(1)
            n = len(ids)
            if n == 0:
                continue
            la = grams.combine_chunks() if isinstance(
                grams, pa.ChunkedArray
            ) else grams
            lengths = np.asarray(
                pc.list_value_length(la).fill_null(0)
            ).astype(np.int64)
            flat = np.asarray(la.flatten()).view(np.uint64)
            # seed-independent per-gram prefix of hashLong
            t = rotl(flat * P2, 31) * P1
            offs = np.zeros(n, dtype=np.int64)
            np.cumsum(lengths[:-1], out=offs[1:])
            nonempty = lengths > 0
            out = np.empty((n, num_hashes), dtype=np.int64)
            starts = offs[nonempty] if not nonempty.all() else offs
            for j in range(num_hashes):
                h = fmix(rotl(seeds[j] ^ t, 27) * P1 + P4).view(np.int64)
                if nonempty.all():
                    out[:, j] = np.minimum.reduceat(h, starts)
                elif nonempty.any():
                    out[nonempty, j] = np.minimum.reduceat(h, starts)
            if nonempty.all():
                sig = pa.ListArray.from_arrays(
                    np.arange(0, (n + 1) * num_hashes, num_hashes,
                              dtype=np.int32),
                    pa.array(out.ravel()),
                )
            else:
                mask = np.repeat(~nonempty, num_hashes)
                sig = pa.ListArray.from_arrays(
                    np.arange(0, (n + 1) * num_hashes, num_hashes,
                              dtype=np.int32),
                    pa.array(out.ravel(), mask=mask),
                )
            yield pa.RecordBatch.from_arrays([ids, sig], ["id", "sig"])

    return fn


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    k: int = 3,
    max_doc_freq: int | None = None,
    engine: str = "arrow",
) -> DataFrame:
    """(id, sig array<long>) — num_hashes independent min-hashes.

    Default path is a NARROW MAP: each document row computes its own
    signature from the in-row shingle-hash array (min over duplicates
    == min over distincts, so no distinct and no groupBy — zero
    shuffles, vs two for the exploded formulation; 4.6s -> ~2s at
    sf0.1). Each hash function is a cheap long-input remix of the
    single string hash (hashing the string once, not 64 times).

    ``engine='arrow'`` (default) evaluates the 64 min-remixes in ONE
    vectorized numpy kernel over Arrow batches (guide: do the heavy
    lifting in native code inside the map stage). The kernel is a
    bit-exact replication of Spark's two-argument ``xxhash64(int,
    bigint)`` — verified value-for-value against the JVM in
    tests — so signatures, bands and downstream pair sets are
    IDENTICAL to ``engine='jvm'``, which keeps the pure-Catalyst
    expression (interpreted higher-order functions, ~4x slower at
    sf0.1). String->shingle hashing stays JVM-side either way; only
    the (grams x seeds) remix+min crosses Arrow, and only the two
    columns it needs are shipped.

    With ``max_doc_freq`` the signature must see only shingles that
    survive the GLOBAL document-frequency cap, which inherently needs
    the exploded inverted index — that path keeps the explode + groupBy
    with 64 min-aggs (partial aggregation applies)."""
    if max_doc_freq is not None:
        sh = shingle_hashes(docs, text_col, id_col, k, max_doc_freq)
        # single-parse SQL strings: same literal-seed xxhash64 aggs as
        # the per-column F.min(...) formulation, built with O(1) py4j
        # calls instead of O(num_hashes)
        mins = [
            F.expr(f"min(xxhash64({i}, sh))").alias(f"h{i}")
            for i in range(num_hashes)
        ]
        sig = sh.groupBy("id").agg(*mins)
        return sig.select(
            "id",
            F.expr(
                "array(" + ",".join(f"h{i}" for i in range(num_hashes)) + ")"
            ).alias("sig"),
        )
    docs = _spread(docs)
    toks = F.split(F.col(text_col), " ", -1)
    n_sh = F.size(toks) - F.lit(k - 1)
    grams = F.when(
        n_sh >= 1,
        F.transform(_word_grams(toks, k), lambda g: F.xxhash64(g)),
    ).otherwise(F.array(F.xxhash64(F.concat_ws(" ", toks))))
    docs_g = docs.select(F.col(id_col).alias("id"), grams.alias("grams"))
    if engine == "arrow" and not _arrow_engine_available():
        engine = "jvm"  # numpy-less deployment: keep the Catalyst twin
    if engine == "arrow":
        # the kernel passes ids through untouched — declare their
        # NATIVE type (string doc ids are the common corpus key; a
        # hard-coded bigint would silently null them)
        id_type = docs_g.schema["id"].dataType.simpleString()
        return docs_g.mapInArrow(
            _minhash_sig_kernel(num_hashes),
            f"id {id_type}, sig array<bigint>",
        )
    # JVM reference path: one SQL parse instead of num_hashes
    # Python-built transform trees (the py4j round trips to assemble 64
    # lambda expressions dominated the whole query's wall time, ~1.5 s
    # per construction at the bench; the parsed tree — literal int
    # seeds, transform, array_min — is IDENTICAL, verified
    # value-for-value).
    sig = F.expr(
        "array("
        + ",".join(
            f"array_min(transform(grams, g -> xxhash64({i}, g)))"
            for i in range(num_hashes)
        )
        + ")"
    )
    return docs_g.select("id", sig.alias("sig"))


def band_buckets(
    sigs: DataFrame, num_hashes: int = 64, bands: int = 16
) -> DataFrame:
    """(id, band, bucket) band membership of each signature — the LSH
    key frame. Shared by the self-join candidate generator below and
    by the incremental cross-snapshot deduper (operators/incremental),
    whose persisted store is exactly these rows for the accepted
    corpus."""
    r = num_hashes // bands
    # one SQL parse for the whole band array (same struct/xxhash64/
    # slice/cast tree the per-band Python build produced)
    band_entries = F.expr(
        "array("
        + ",".join(
            f"struct({b} as band, xxhash64({b}, "
            f"cast(slice(sig, {b * r + 1}, {r}) as string)) as bucket)"
            for b in range(bands)
        )
        + ")"
    )
    return sigs.select("id", F.explode(band_entries).alias("e")).select(
        "id", "e.band", "e.bucket"
    )


def lsh_candidate_pairs(
    sigs: DataFrame, num_hashes: int = 64, bands: int = 16
) -> DataFrame:
    """Banded LSH: docs agreeing on all rows of any band land in the
    same bucket; the pair join runs per (band, bucket) only."""
    buckets = band_buckets(sigs, num_hashes, bands)
    a = buckets.select(F.col("id").alias("doc_a"), "band", "bucket")
    b = buckets.select(F.col("id").alias("doc_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs: LSH candidates filtered by the signature
    Jaccard estimate (fraction of agreeing min-hashes).

    Signatures feed the band explode and both sides of the estimate
    join; localCheckpoint materializes them once, leak-free (see
    ngram_jaccard_pairs)."""
    sigs = minhash_signatures(
        docs, text_col, id_col, num_hashes, k, max_doc_freq
    ).localCheckpoint(eager=True)
    cands = lsh_candidate_pairs(sigs, num_hashes, bands)
    sa = sigs.select(F.col("id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("id").alias("doc_b"), F.col("sig").alias("sig_b"))
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m
            )
        ).cast("double")
        / F.lit(float(num_hashes))
    )
    return (
        cands.join(sa, ["doc_a"])
        .join(sb, ["doc_b"])
        .select("doc_a", "doc_b", est.alias("est_jaccard"))
        .where(F.col("est_jaccard") >= threshold)
    )


# --------------------------------- SimHash --------------------------------
def _simhash_kernel():
    """mapInArrow function: 64-bit SimHash from the in-row distinct
    token-hash array — per bit i, +1/-1 votes over the hashes collapse
    to 2*popcount_i > n; set bits OR into one long (bit 63 wraps to
    the sign bit exactly like shiftleft(1L, 63)). Vectorized numpy,
    value-identical to the explode+groupBy vote aggregation."""

    def fn(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            ids = batch.column(0)
            hs = batch.column(1)
            n = len(ids)
            if n == 0:
                continue
            la = hs.combine_chunks() if isinstance(hs, pa.ChunkedArray) else hs
            lengths = np.asarray(
                pc.list_value_length(la).fill_null(0)
            ).astype(np.int64)
            flat = np.asarray(la.flatten()).view(np.uint64)
            # explode semantics: a doc whose hash array is EMPTY emits
            # no row — drop it here too (unreachable with the current
            # tokenizer, split() always yields >= 1 token, but an
            # upstream change must not silently emit simhash=0; and an
            # empty LAST row would make offs[-1] == flat.size, an
            # np.add.reduceat IndexError). Same guard pattern as
            # _minhash_sig_kernel's ``starts``.
            nonempty = lengths > 0
            if not nonempty.all():
                ids = ids.filter(pa.array(nonempty))
                lengths = lengths[nonempty]
                n = len(lengths)
                if n == 0:
                    continue
            offs = np.zeros(n, dtype=np.int64)
            np.cumsum(lengths[:-1], out=offs[1:])
            packed = np.zeros(n, dtype=np.uint64)
            one = np.uint64(1)
            for i in range(64):
                bit = ((flat >> np.uint64(i)) & one).astype(np.int64)
                cnt = np.add.reduceat(bit, offs)
                packed |= np.where(2 * cnt > lengths, one << np.uint64(i),
                                   np.uint64(0))
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(packed.view(np.int64))], ["id", "simhash"]
            )

    return fn


def simhash(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    engine: str = "arrow",
) -> DataFrame:
    """(id, simhash long) — 64-bit SimHash over distinct tokens.

    Per-bit vote: +1 if the token hash has the bit set, else -1;
    bit is 1 when the vote sum is positive. Bits are OR-folded into one
    long (no additive overflow under ANSI mode).

    ``engine='arrow'`` (default, r14) computes the votes from the
    IN-ROW distinct token-hash array in one vectorized numpy map stage
    — a narrow map with ZERO exchanges, vs the explode + 64-sum
    groupBy aggregation the JVM path keeps (one exchange plus the
    exploded materialization). Token hashing stays JVM-side
    (xxhash64 over strings); value-identity is pinned in
    tests/test_dedup.py. Docs with NULL text are dropped by both
    paths (explode of null vs an explicit filter)."""
    docs = _spread(docs)
    if engine == "arrow" and not _arrow_engine_available():
        engine = "jvm"  # numpy-less deployment: keep the Catalyst twin
    if engine == "arrow":
        hs = F.transform(
            F.array_distinct(F.split(F.col(text_col), " ", -1)),
            lambda t: F.xxhash64(t),
        )
        dg = docs.select(F.col(id_col).alias("id"), hs.alias("hs")).where(
            F.col("hs").isNotNull()
        )
        id_type = dg.schema["id"].dataType.simpleString()
        return dg.mapInArrow(
            _simhash_kernel(), f"id {id_type}, simhash bigint"
        )
    toks = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(F.array_distinct(F.split(F.col(text_col), " ", -1))).alias(
                "tok"
            ),
        )
        .withColumn("h", F.xxhash64("tok"))
    )
    # single-parse SQL strings (identical expression trees; the 128
    # Python-built when/shift columns dominated construction time)
    votes = toks.groupBy("id").agg(
        *[
            F.expr(
                f"sum(CASE WHEN (shiftrightunsigned(h, {i}) & 1) = 1 "
                "THEN 1 ELSE -1 END)"
            ).alias(f"v{i}")
            for i in range(64)
        ]
    )
    packed = F.expr(
        " | ".join(
            f"(CASE WHEN v{i} > 0 THEN shiftleft(CAST(1 AS BIGINT), {i}) "
            f"ELSE CAST(0 AS BIGINT) END)"
            for i in range(64)
        )
    )
    return votes.select("id", packed.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, candidates via the
    4x16-bit chunk pigeonhole (d<=3 implies one identical chunk).
    Sketches materialized once via localCheckpoint, leak-free (see
    ngram_jaccard_pairs)."""
    sh = simhash(docs, text_col, id_col).localCheckpoint(eager=True)
    chunks = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_no"),
                        F.shiftrightunsigned(F.col("simhash"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("e"),
    ).select("id", "simhash", "e.chunk_no", "e.chunk")
    a = chunks.select(
        F.col("id").alias("doc_a"), F.col("simhash").alias("sh_a"), "chunk_no", "chunk"
    )
    b = chunks.select(
        F.col("id").alias("doc_b"), F.col("simhash").alias("sh_b"), "chunk_no", "chunk"
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    # verify (cheap bit_count) BEFORE the dedup shuffle: distinct then
    # only moves true near-dup pairs, not every chunk collision
    return (
        a.join(b, ["chunk_no", "chunk"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ------------------------- embedding near-dup pairs -----------------------
def embedding_near_dup_pairs(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
) -> DataFrame:
    """Exact cosine near-dup pairs (decimal-exact math).

    This is the correctness baseline (all pairs); the scale path is
    similarity.lsh_bucketed_pairs which prunes candidates first.
    """
    from python_etl_spark.functions.vector import (
        as_double,
        cosine_from_parts,
        dot_exact,
        norm_sq_exact,
    )

    v = embeddings.select(
        F.col(id_col).alias("id"), as_double(vec_col).alias("vec")
    )
    withnorm = v.select("id", "vec", norm_sq_exact("vec").alias("nsq"))
    a = withnorm.select(
        F.col("id").alias("vec_a"), F.col("vec").alias("va"), F.col("nsq").alias("na")
    )
    b = withnorm.select(
        F.col("id").alias("vec_b"), F.col("vec").alias("vb"), F.col("nsq").alias("nb")
    )
    cos = cosine_from_parts(
        dot_exact("va", "vb"), F.col("na"), F.col("nb")
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


# ------------------------------ unified facade ----------------------------
def near_dup(
    docs: DataFrame,
    method: str = "minhash",
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """One entry point over the dedup family.

    method: 'exact' | 'ngram' | 'minhash' | 'simhash' | 'embedding' |
    'embedding_lsh'. 'minhash' is the 100 TB default for text; 'ngram'
    is its exact (more expensive) twin. 'embedding' / 'embedding_lsh'
    expect an array<float> column named by ``text_col``: 'embedding' is
    the exact all-pairs baseline, 'embedding_lsh' the LSH-bucketed
    100 TB path (similarity.lsh_bucketed_pairs).
    """
    if method == "exact":
        hashed = docs.groupBy(
            F.md5(F.encode(F.col(text_col), "UTF-8")).alias("h")
        ).agg(
            F.min(id_col).alias("keeper"),
            F.collect_list(id_col).alias("members"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        return hashed.where(F.col("n_copies") > 1)
    if method == "ngram":
        return ngram_jaccard_pairs(docs, text_col, id_col, **kwargs)
    if method == "minhash":
        return minhash_lsh_pairs(docs, text_col, id_col, **kwargs)
    if method == "simhash":
        return simhash_pairs(docs, text_col, id_col, **kwargs)
    if method == "embedding":
        return embedding_near_dup_pairs(
            docs, vec_col=text_col, id_col=id_col, **kwargs
        )
    if method == "embedding_lsh":
        from python_etl_spark.operators.similarity import lsh_bucketed_pairs

        return lsh_bucketed_pairs(docs, vec_col=text_col, id_col=id_col, **kwargs)
    raise ValueError(
        f"unknown method {method!r}; have "
        "exact/ngram/minhash/simhash/embedding/embedding_lsh"
    )


def containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Asymmetric shingle containment |A ∩ B| / |A| — the quote /
    subset-duplication detector (a short doc fully quoted inside a long
    one has low Jaccard but containment ~1). Same inverted-index join
    as ``ngram_jaccard_pairs``; ordered pairs (a != b), cost tracks
    true overlap, never n^2.

    The shingle frame comes from the session-shared sh-partitioned
    cache (shared_shingle_hashes, single slot — bounded storage), so
    containment / capped-containment / jaccard / boilerplate within
    one sweep shingle the corpus exactly once, the self-join needs no
    join-side exchanges, and set sizes ride the pair aggregation as
    first() — no sizes aggregation or join (uncapped path)."""
    sh, sizes = _shingles_with_sizes(docs, text_col, id_col, k, max_doc_freq)
    # |A∩B| is symmetric: count each unordered pair once (a < b) —
    # halving the pair-aggregation shuffle, the dominant cost — then
    # mirror the aggregated counts to recover ordered pairs.
    if sizes is None:
        a = sh.select(F.col("id").alias("doc_a"), "na", "sh")
        b = sh.select(
            F.col("id").alias("doc_b"), F.col("na").alias("nb"), "sh"
        )
        # hint("merge"): see ngram_jaccard_pairs — exchange-free SMJ over
        # the co-partitioned cached frame instead of a broadcast build
        half = (
            a.join(b.hint("merge"), ["sh"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(
                F.count(F.lit(1)).alias("shared"),
                F.first("na").alias("na"),
                F.first("nb").alias("nb"),
            )
        )
    else:
        a = sh.select(F.col("id").alias("doc_a"), "sh")
        b = sh.select(F.col("id").alias("doc_b"), "sh")
        pair = (
            a.join(b.hint("merge"), ["sh"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("shared"))
        )
        sa = sizes.select(F.col("id").alias("doc_a"), F.col("n_sh").alias("na"))
        sb = sizes.select(F.col("id").alias("doc_b"), F.col("n_sh").alias("nb"))
        half = pair.join(sa, ["doc_a"]).join(sb, ["doc_b"])
    shared = half.select("doc_a", "doc_b", "shared", "na").unionByName(
        half.select(
            F.col("doc_b").alias("doc_a"),
            F.col("doc_a").alias("doc_b"),
            "shared",
            F.col("nb").alias("na"),
        )
    )
    cont = F.col("shared").cast("double") / F.col("na")
    return (
        shared.select("doc_a", "doc_b", cont.alias("containment"))
        .where(F.col("containment") >= threshold)
    )


def char_gram_jaccard_pairs(
    df: DataFrame,
    col: str,
    k: int = 3,
    threshold: float = 0.4,
) -> DataFrame:
    """Fuzzy STRING matching (entity resolution on names/titles):
    character k-gram Jaccard over the DISTINCT values of ``col``,
    via the same inverted-index join the document dedup uses — cost
    tracks shared grams, never |values|². Ordered pairs
    (val_a < val_b) with jaccard >= threshold.

    Word-gram Jaccard can't see "Jonh Smith" ~ "John Smith"; char
    grams can. Dedup the value domain FIRST (names repeat massively
    in fact tables), match on the tiny distinct set, then join labels
    back to rows."""
    vals = df.select(F.col(col).alias("val")).distinct()
    n = F.length("val") - (k - 1)
    # substring(col, pos, len) needs a column pos — SQL expr form
    grams = vals.where(n >= 1).select(
        "val",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, length(val) - {k - 1}), "
                    f"i -> substring(val, i, {k}))"
                )
            )
        ).alias("g"),
    )
    sizes = grams.groupBy("val").agg(F.count(F.lit(1)).alias("ng"))
    a = grams.select(F.col("val").alias("val_a"), "g")
    b = grams.select(F.col("val").alias("val_b"), "g")
    shared = (
        a.join(b, ["g"])
        .where(F.col("val_a") < F.col("val_b"))
        .groupBy("val_a", "val_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("val").alias("val_a"), F.col("ng").alias("na"))
    sb = sizes.select(F.col("val").alias("val_b"), F.col("ng").alias("nb"))
    jac = F.round(
        F.col("shared").cast("double")
        / (F.col("na") + F.col("nb") - F.col("shared")),
        6,
    )
    return (
        shared.join(F.broadcast(sa), ["val_a"])
        .join(F.broadcast(sb), ["val_b"])
        .select("val_a", "val_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def segment_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 8,
) -> DataFrame:
    """C4-style corpus-wide SEGMENT-level exact dedup with reassembly:
    split each doc into non-overlapping ``width``-token segments, keep
    each distinct segment's first occurrence (by doc id, then
    position), drop repeats, and rebuild the surviving text in order.
    Returns (id, n_seg, n_kept, text_out).

    Scale posture: keep-first is a window partitioned by the segment
    text (hash-distributed; Spark plans a map-side WindowGroupLimit so
    the shuffle carries one candidate winner per (segment, task));
    reassembly is a groupBy(id) whose group size is bounded by doc
    length. Two shuffles, no global window, no collect."""
    toks = F.split(F.col(text_col), " ", -1)
    n_seg = F.ceil(F.size(toks) / F.lit(float(width))).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.array_join(F.slice(toks, i * width + 1, width), " "),
    )
    exploded = docs.select(
        F.col(id_col).alias("id"), F.posexplode(segs).alias("pos", "seg")
    )
    w = Window.partitionBy("seg").orderBy("id", "pos")
    kept = (
        exploded.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    re = kept.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda s: s.seg,
            ),
        ).alias("text_out"),
    )
    return (
        docs.select(F.col(id_col).alias("id"), n_seg.alias("n_seg"))
        .join(re, "id", "left")
        .select(
            "id",
            "n_seg",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("text_out", F.lit("")).alias("text_out"),
        )
    )


def exact_substr_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
) -> DataFrame:
    """ExactSubstr span removal (Lee et al.): drop every token covered
    by an overlapping ``window``-token window whose content occurs >=2
    times corpus-wide (BOTH copies — the paper's behavior), reassemble
    the survivors in order. Returns (id, dedup_text, n_tokens,
    n_removed_tokens). Hashed-window pigeonhole instead of a suffix
    array; reassembly is a zero-shuffle higher-order filter. Shared by
    the registered `text_exact_substr_dedup` query (hash-oracled) and
    the incremental-corpus example."""
    toks = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ", -1).alias("t")
    )
    n = F.size("t")
    wins = toks.where(n >= window).select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n - window),
                lambda i: F.md5(
                    F.array_join(F.slice(F.col("t"), i + 1, window), " ")
                ),
            )
        ).alias("i", "wh"),
    )
    wc = (
        wins.groupBy("wh")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
        .select("wh")
    )
    cov = wins.join(wc, "wh").select(
        id_col,
        F.explode(
            F.sequence(F.col("i"), F.col("i") + F.lit(window - 1))
        ).alias("p"),
    )
    covarr = cov.groupBy(id_col).agg(F.collect_set("p").alias("cov"))
    joined = toks.join(covarr, id_col, "left")
    kept = F.filter(
        F.transform(
            "t",
            lambda x, i: F.when(
                F.col("cov").isNull() | ~F.array_contains("cov", i), x
            ),
        ),
        lambda x: x.isNotNull(),
    )
    return joined.select(
        id_col,
        F.array_join(kept, " ").alias("dedup_text"),
        F.size("t").cast("int").alias("n_tokens"),
        (F.size("t") - F.size(kept)).cast("int").alias("n_removed_tokens"),
    )


def remove_reference_spans(
    docs: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
) -> DataFrame:
    """Benchmark DECONTAMINATION by span removal: drop every token of
    ``docs`` covered by an overlapping ``window``-token window whose
    content appears ANYWHERE in ``reference`` (the eval/benchmark
    corpus), reassemble the survivors. The flagging op
    (dedup_contamination) tells you WHICH docs overlap a benchmark;
    this one surgically removes the overlapping spans so the document
    survives training with the leaked answer text cut out — the
    standard pretraining decontamination posture.

    Plan shape: reference windows reduce to a DISTINCT hash set (tiny:
    benchmarks are MBs, corpora are TBs); doc windows left-semi join
    it (broadcastable), covered positions roll up per doc, reassembly
    is the same zero-shuffle higher-order filter as
    exact_substr_dedup. Returns (id, clean_text, n_tokens,
    n_removed_tokens)."""

    def windows(frame, keep_pos: bool):
        toks = frame.select(
            F.col(id_col), F.split(F.col(text_col), " ", -1).alias("t")
        )
        n = F.size("t")
        cols = [id_col] if keep_pos else []
        w = toks.where(n >= window).select(
            *cols,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n - window),
                    lambda i: F.md5(
                        F.array_join(F.slice(F.col("t"), i + 1, window), " ")
                    ),
                )
            ).alias("i", "wh"),
        )
        return toks, w

    toks, dw = windows(docs, keep_pos=True)
    _, rw = windows(reference, keep_pos=False)
    ref_set = rw.select("wh").distinct()
    cov = dw.join(ref_set, "wh", "left_semi").select(
        id_col,
        F.explode(
            F.sequence(F.col("i"), F.col("i") + F.lit(window - 1))
        ).alias("p"),
    )
    covarr = cov.groupBy(id_col).agg(F.collect_set("p").alias("cov"))
    joined = toks.join(covarr, id_col, "left")
    kept = F.filter(
        F.transform(
            "t",
            lambda x, i: F.when(
                F.col("cov").isNull() | ~F.array_contains("cov", i), x
            ),
        ),
        lambda x: x.isNotNull(),
    )
    return joined.select(
        id_col,
        F.array_join(kept, " ").alias("clean_text"),
        F.size("t").cast("int").alias("n_tokens"),
        (F.size("t") - F.size(kept)).cast("int").alias("n_removed_tokens"),
    )
