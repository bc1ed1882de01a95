"""Property tests: the custom distributed operators against
reference implementations (pandas merge_asof; a pure-Python
sessionizer) on randomized inputs."""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd
import pytest

from python_etl_spark.operators.asof import asof_join
from python_etl_spark.operators.sessionize import sessionize

BASE_TS = dt.datetime(2024, 1, 1)


def _random_events(rng, n, keys, max_minutes=5000):
    rows = []
    for i in range(n):
        rows.append(
            (
                rng.choice(keys),
                BASE_TS + dt.timedelta(minutes=rng.randrange(max_minutes)),
                float(i),
                i,
            )
        )
    return rows


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_asof_join_matches_pandas_merge_asof(spark, seed):
    rng = random.Random(seed)
    left_rows = _random_events(rng, 80, [1, 2, 3])
    right_rows = _random_events(rng, 60, [1, 2, 4])
    # dedupe right timestamps per key: merge_asof on ties is ambiguous
    seen = set()
    right_rows = [
        r for r in right_rows
        if (r[0], r[1]) not in seen and not seen.add((r[0], r[1]))
    ]
    left = spark.createDataFrame(
        left_rows, "k long, ts timestamp_ntz, lv double, lid long"
    )
    right = spark.createDataFrame(
        [(k, t, v) for k, t, v, _ in right_rows],
        "k long, rts timestamp_ntz, rv double",
    )
    got = {
        r.lid: r.rv
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_cols=["rv"],
        ).collect()
    }

    lp = pd.DataFrame(left_rows, columns=["k", "ts", "lv", "lid"]).sort_values("ts")
    rp = pd.DataFrame(
        [(k, t, v) for k, t, v, _ in right_rows], columns=["k", "rts", "rv"]
    ).sort_values("rts")
    merged = pd.merge_asof(
        lp, rp, left_on="ts", right_on="rts", by="k", direction="backward"
    )
    expected = {
        int(r.lid): (None if pd.isna(r.rv) else float(r.rv))
        for r in merged.itertuples()
    }
    assert got == expected


def _reference_sessionize(rows, gap_minutes):
    by_user: dict = {}
    for user, ts, value in rows:
        by_user.setdefault(user, []).append((ts, value))
    out = {}
    for user, evs in by_user.items():
        evs.sort()
        idx = 0
        for i, (ts, value) in enumerate(evs):
            if i == 0 or (ts - evs[i - 1][0]) > dt.timedelta(
                minutes=gap_minutes
            ):
                idx += 1
                out[(user, idx)] = [1, ts, ts, value]
            else:
                s = out[(user, idx)]
                s[0] += 1
                s[2] = ts
                s[3] = round(s[3] + value, 6)
    return {k: (v[0], v[1], v[2]) for k, v in out.items()}


@pytest.mark.parametrize("seed", [3, 11])
def test_sessionize_matches_reference(spark, seed):
    rng = random.Random(seed)
    rows = [
        (u, t, v)
        for (u, t, v, _) in _random_events(rng, 200, [1, 2, 3, 4])
    ]
    # unique ts per user so ordering is total without a tiebreak column
    seen = set()
    rows = [
        r for r in rows
        if (r[0], r[1]) not in seen and not seen.add((r[0], r[1]))
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, value double")
    got = {
        (r.user_id, r.session_idx): (r.n_events, r.session_start, r.session_end)
        for r in sessionize(df, gap_minutes=45, value_col="value").collect()
    }
    assert got == _reference_sessionize(rows, 45)
