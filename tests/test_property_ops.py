"""Property tests for the trickiest relational operators: as-of join
vs pandas merge_asof (the independent reference implementation), and
upsert key/winner invariants — randomized inputs via hypothesis."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

# (key, ts) pairs; duplicates and empty sides must all behave
EVENTS = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)),
    min_size=1,
    max_size=12,
)


@settings(max_examples=8, deadline=None)
@given(EVENTS, EVENTS)
def test_asof_join_matches_pandas_merge_asof(spark, lrows, rrows):
    from python_etl_spark.operators.asof import asof_join

    # right side must be unique on (key, ts): at equal timestamps the
    # carried value would be order-dependent in ANY asof engine
    rrows = list({(k, t): None for k, t in rrows})
    left = spark.createDataFrame(
        [(k, t) for k, t in lrows], "k long, lts long"
    )
    right = spark.createDataFrame(
        [(k, t, k * 100 + t) for k, t in rrows], "k long, rts long, val long"
    )
    got = {
        (r.k, r.lts, i): r.val
        for i, r in enumerate(
            sorted(
                asof_join(left, right, "k", "lts", "rts").collect(),
                key=lambda r: (r.k, r.lts),
            )
        )
    }

    lp = pd.DataFrame(sorted(lrows), columns=["k", "lts"])
    rp = pd.DataFrame(
        sorted((k, t, k * 100 + t) for k, t in rrows),
        columns=["k", "rts", "val"],
    ).sort_values("rts", kind="stable")
    want_df = pd.merge_asof(
        lp.sort_values("lts", kind="stable"),
        rp,
        left_on="lts",
        right_on="rts",
        by="k",
        direction="backward",
    ).sort_values(["k", "lts"], kind="stable")
    want = {
        (r.k, r.lts, i): None if pd.isna(r.val) else int(r.val)
        for i, r in enumerate(want_df.itertuples(index=False))
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 5), st.integers(0, 9)), max_size=10),
    st.lists(st.tuples(st.integers(0, 5), st.integers(0, 9)), max_size=10),
)
def test_upsert_invariants(spark, base_rows, upd_rows):
    from python_etl_spark.operators.upsert import upsert

    # key-unique frames (upsert's contract): keep max version per key
    base = {k: v for k, v in sorted(base_rows)}
    upd = {k: v for k, v in sorted(upd_rows)}
    bdf = spark.createDataFrame(
        list(base.items()) or [(None, None)], "k long, v long"
    ).where("k IS NOT NULL")
    udf_ = spark.createDataFrame(
        list(upd.items()) or [(None, None)], "k long, v long"
    ).where("k IS NOT NULL")
    got = {r.k: r.v for r in upsert(bdf, udf_, ["k"]).collect()}
    want = {**base, **upd}
    assert got == want


@settings(max_examples=8, deadline=None)
@given(EVENTS, EVENTS, st.sampled_from(["forward", "nearest"]))
def test_asof_directions_match_pandas(spark, lrows, rrows, direction):
    """forward / nearest as-of must agree with pandas merge_asof on
    randomized inputs, including equal-timestamp and equal-distance
    ties (both prefer backward on nearest ties)."""
    from python_etl_spark.operators.asof import asof_join

    rrows = list({(k, t): None for k, t in rrows})
    left = spark.createDataFrame(
        [(k, t) for k, t in lrows], "k long, lts long"
    )
    right = spark.createDataFrame(
        [(k, t, k * 100 + t) for k, t in rrows], "k long, rts long, val long"
    )
    got = {
        (r.k, r.lts, i): r.val
        for i, r in enumerate(
            sorted(
                asof_join(
                    left, right, "k", "lts", "rts", direction=direction
                ).collect(),
                key=lambda r: (r.k, r.lts),
            )
        )
    }

    lp = pd.DataFrame(sorted(lrows), columns=["k", "lts"])
    rp = pd.DataFrame(
        sorted((k, t, k * 100 + t) for k, t in rrows),
        columns=["k", "rts", "val"],
    ).sort_values("rts", kind="stable")
    want_df = pd.merge_asof(
        lp.sort_values("lts", kind="stable"),
        rp,
        left_on="lts",
        right_on="rts",
        by="k",
        direction=direction,
    ).sort_values(["k", "lts"], kind="stable")
    want = {
        (r.k, r.lts, i): None if pd.isna(r.val) else int(r.val)
        for i, r in enumerate(want_df.itertuples(index=False))
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 80),
                       st.integers(1, 40)), min_size=1, max_size=10),
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 80),
                       st.integers(1, 40)), min_size=1, max_size=10),
)
def test_interval_overlap_join_matches_naive(spark, arows, brows):
    """Grid-bucketed interval join == the naive theta join on
    randomized half-open intervals (keys, arbitrary spans crossing
    many buckets, duplicates)."""
    import datetime as dt

    from pyspark.sql import functions as SF

    from python_etl_spark.operators.range_join import interval_overlap_join

    base = dt.datetime(2024, 1, 1)

    def frame(rows, prefix):
        data = [
            (i, k, base + dt.timedelta(minutes=s),
             base + dt.timedelta(minutes=s + d))
            for i, (k, s, d) in enumerate(rows)
        ]
        return spark.createDataFrame(
            data, f"{prefix}id long, k long, {prefix}s timestamp, {prefix}e timestamp"
        )

    a = frame(arows, "a")
    b = frame(brows, "b")
    got = {
        (r.aid, r.bid)
        for r in interval_overlap_join(
            a, b, ["k"], "as", "ae", "bs", "be", bucket_width_s=600
        ).collect()
    }
    naive = {
        (r.aid, r.bid)
        for r in a.join(
            b,
            (a.k == b.k) & (SF.col("as") < SF.col("be"))
            & (SF.col("bs") < SF.col("ae")),
        ).collect()
    }
    assert got == naive


CHANGES = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 30), st.integers(0, 99)),
    min_size=1,
    max_size=15,
    unique_by=lambda c: (c[0], c[1]),  # one change per (key, version)
)


@settings(max_examples=8, deadline=None)
@given(CHANGES, st.randoms())
def test_versioned_upsert_batch_order_invariant(spark, changes, rnd):
    """Version-aware upsert must converge to the same final state no
    matter how the change stream is split into batches or in what
    order the batches are merged — the property that makes the CDC
    MERGE replay- and reorder-safe."""
    from python_etl_spark.operators.upsert import upsert

    # truth: highest version per key
    truth = {}
    for k, ver, v in changes:
        if k not in truth or ver > truth[k][0]:
            truth[k] = (ver, v)

    shuffled = list(changes)
    rnd.shuffle(shuffled)
    cut = rnd.randrange(len(shuffled) + 1)
    batches = [b for b in (shuffled[:cut], shuffled[cut:]) if b]
    # replay one batch twice to model a crash-and-replay
    if batches:
        batches.append(batches[0])

    state = None
    for batch in batches:
        bdf = spark.createDataFrame(
            [(k, v, ver) for k, ver, v in batch], "k long, v long, ver long"
        )
        state = bdf if state is None else upsert(
            state, bdf, ["k"], version_col="ver"
        )
    got = {r.k: (r.ver, r.v) for r in state.collect()}
    assert got == truth


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 25)),
        min_size=1,
        max_size=30,
    )
)
def test_streak_islands_match_reference(spark, pairs):
    """win_streak_detection's island logic vs a direct per-user scan
    over the sorted distinct day list."""
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    base = dt.date(2024, 1, 1)
    rows = sorted({(u, base + dt.timedelta(days=d)) for u, d in pairs})
    df = spark.createDataFrame(rows, "user_id long, d date")
    w = Window.partitionBy("user_id").orderBy("d")
    got = {
        r.user_id: (r.longest, r.n_streaks)
        for r in df.select(
            "user_id", F.date_sub("d", F.row_number().over(w)).alias("g")
        )
        .groupBy("user_id", "g")
        .agg(F.count(F.lit(1)).alias("len"))
        .groupBy("user_id")
        .agg(
            F.max("len").alias("longest"),
            F.count(F.lit(1)).alias("n_streaks"),
        )
        .collect()
    }

    want = {}
    bydays = {}
    for u, d in rows:
        bydays.setdefault(u, []).append(d)
    for u, days in bydays.items():
        longest, cur, streaks = 1, 1, 1
        for a, b in zip(days, days[1:]):
            if (b - a).days == 1:
                cur += 1
            else:
                streaks += 1
                cur = 1
            longest = max(longest, cur)
        want[u] = (longest, streaks)
    assert got == want


@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=20
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=10, deadline=None)
def test_segment_dedup_invariants(spark, token_lists):
    """Randomized corpora: (1) kept segments are globally distinct,
    (2) each doc's surviving text is its own segments in original order
    with repeats removed, (3) the first corpus-wide occurrence of every
    segment survives. Reference computed in plain python."""
    import tempfile

    from python_etl_spark.plans.training import _SEG_W, text_segment_dedup

    docs = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            docs, "doc_id long, text string"
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = {
            r.doc_id: (r.n_seg, r.n_kept, r.text_out)
            for r in text_segment_dedup(spark, d).collect()
        }

    # python reference
    seen: set[str] = set()
    for i, toks in enumerate(docs):
        t = docs[i][1].split(" ")
        segs = [
            " ".join(t[j : j + _SEG_W]) for j in range(0, len(t), _SEG_W)
        ]
        kept = []
        for s in segs:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        n_seg, n_kept, text_out = got[i]
        assert n_seg == len(segs)
        assert n_kept == len(kept)
        assert text_out == " ".join(kept)


# ------------------- continuation-session op properties ---------------------

OPSEQ = st.lists(
    st.sampled_from(
        ["append", "delete", "compact", "overwrite", "compact_bins"]
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=6, deadline=None)
@given(OPSEQ, st.integers(0, 1000))
def test_row_count_matches_scan_under_any_op_sequence(
    spark, tmp_path_factory, ops, seed
):
    """row_count() (metadata-only) must equal read().count() after ANY
    interleaving of append / delete_where / compact / overwrite."""
    from pyspark.sql import functions as F

    from python_etl_spark.sinks.table import VersionedTable

    root = tmp_path_factory.mktemp("rcprop")
    t = VersionedTable(str(root / "t"))
    rng = seed
    t.create(spark.range(0, 20).selectExpr("id AS k"))
    lo = 20
    for op in ops:
        rng = (rng * 1103515245 + 12345) % (2**31)
        if op == "append":
            n = rng % 15 + 1
            t.append(spark.range(lo, lo + n).selectExpr("id AS k"))
            lo += n
        elif op == "delete":
            t.delete_where(F.col("k") % 7 == rng % 7)
        elif op == "compact":
            t.compact(spark)
        elif op == "compact_bins":
            t.compact_bins(spark, small_bytes=1 << 30)  # packs all dirs
        else:
            n = rng % 10 + 1
            t.overwrite(spark.range(lo, lo + n).selectExpr("id AS k"))
            lo += n
    assert t.row_count() == t.read(spark).count()


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(0, 600), min_size=1, max_size=20),
    st.integers(1, 500),
)
def test_vad_segments_match_reference_islands(spark, energies, threshold):
    """vad_segments equals the obvious sequential islands scan for any
    energy sequence and threshold."""
    from python_etl_spark.operators.multimodal import vad_segments

    frames = spark.createDataFrame(
        [(1, f, e) for f, e in enumerate(energies)],
        "doc_id long, f long, energy long",
    )
    got = {
        (r["seg_start"], r["seg_len"])
        for r in vad_segments(frames, threshold=threshold).collect()
    }
    want, start = set(), None
    for f, e in enumerate(energies + [0 if threshold >= 0 else -1]):
        if e > threshold and start is None:
            start = f
        elif e <= threshold and start is not None:
            want.add((start, f - start))
            start = None
    assert got == want


@settings(max_examples=6, deadline=None)
@given(st.lists(st.integers(0, 40), min_size=2, max_size=10, unique=True))
def test_mmr_rerank_invariants(spark, ids):
    """MMR selection: distinct picks, first = max relevance (id
    tie-break), every pick from the pool, trace rel matches the
    pool's."""
    import numpy as np

    from python_etl_spark.operators.similarity import mmr_rerank

    rows = []
    for i in [99] + ids:  # 99 = query vector
        rng = np.random.default_rng(i)
        rows.append((i, [float(x) for x in rng.normal(size=8)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    k = min(3, len(ids))
    out = sorted(
        mmr_rerank(emb, query_id=99, pool_n=5, k=k).collect(),
        key=lambda r: r["rank"],
    )
    assert len(out) == k
    picks = [r["vec_id"] for r in out]
    assert len(set(picks)) == k and 99 not in picks
    rels = {r["vec_id"]: r["rel"] for r in out}
    # first pick maximizes rel over the pool (rel desc, id asc)
    from python_etl_spark.functions.vector import cosine
    from pyspark.sql import functions as F

    pool = (
        emb.where(F.col("vec_id") != 99)
        .crossJoin(
            emb.where(F.col("vec_id") == 99).select(
                F.col("embedding").alias("q")
            )
        )
        .select("vec_id", cosine("embedding", "q").alias("rel"))
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(5)
        .collect()
    )
    assert out[0]["vec_id"] == pool[0]["vec_id"]
    assert rels[out[0]["vec_id"]] == pool[0]["rel"]


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.sampled_from(["append", "merge", "delete", "compact"]),
        min_size=1,
        max_size=5,
    ),
    st.integers(0, 1000),
)
def test_row_changes_replay_reproduces_snapshot_under_any_ops(
    spark, tmp_path_factory, ops, seed
):
    """The change-feed CONTRACT as a property: for ANY interleaving of
    append / merge / delete_where / compact, replaying row_changes(0)
    onto the v0 snapshot (latest change per key, same-commit postimage
    beats preimage, deletes drop the key) reproduces read(latest)
    exactly."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from python_etl_spark.sinks.table import VersionedTable

    root = tmp_path_factory.mktemp("cdfprop")
    t = VersionedTable(str(root / "t"))
    rng = seed

    def frame(lo, n, tag):
        return spark.range(lo, lo + n).selectExpr(
            "id AS k", f"id * 10 AS v", f"'{tag}' AS s"
        )

    t.create(frame(0, 12, "base"))
    # appended keys live in a high range disjoint from merge keys
    # (id * 2 <= ~2010), so the table stays key-unique and the
    # one-row-per-key replay semantics apply
    lo = 100000
    for op in ops:
        rng = (rng * 1103515245 + 12345) % (2**31)
        if op == "append":
            n = rng % 8 + 1
            t.append(frame(lo, n, "app"))
            lo += n
        elif op == "merge":
            # touch a mix of existing and brand-new keys
            upd = spark.range(rng % 5, rng % 5 + 6).selectExpr(
                "id * 2 AS k", f"id + {rng % 100} AS v", "'upd' AS s"
            )
            t.merge(upd, ["k"])
        elif op == "delete":
            t.delete_where(F.col("k") % 5 == rng % 5)
        else:
            t.compact(spark)

    feed = t.row_changes(spark, 0)
    w = Window.partitionBy("k").orderBy(
        F.desc("_commit_version"),
        F.when(F.col("_change_type") == "update_preimage", 1).otherwise(0),
    )
    last = feed.withColumn("rn", F.row_number().over(w)).where("rn = 1")
    alive = last.where(
        F.col("_change_type").isin("insert", "update_postimage")
    ).select("k", "v", "s")
    replayed = (
        t.read(spark, 0)
        .join(last.select("k"), "k", "left_anti")
        .select("k", "v", "s")
        .unionByName(alive)
    )
    got = sorted(tuple(r) for r in replayed.collect())
    want = sorted(
        tuple(r) for r in t.read(spark).select("k", "v", "s").collect()
    )
    assert got == want
