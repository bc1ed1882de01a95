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
