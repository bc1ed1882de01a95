"""CI-asserted 10x scale rehearsal (VERDICT r4 instruction #5).

Runs scripts/bench_scaling.run_rehearsal over the full rehearsal set —
including the round-4 worst plans (decile report, RFM segmentation, the
containment family, dedup_groups) — against the 10x replica built by
scripts/make_scale_replica.py, and asserts every query stays within its
linear (or labeled-quadratic) bound. Skipped when the replica dir is
absent (build it with ``python scripts/make_scale_replica.py``) or when
SPARK_GRAFT_SKIP_SCALING=1 (fast dev loops).
"""

from __future__ import annotations

import os
from pathlib import Path

import pytest

SMALL = "/root/testdata/sf0.1"
BIG = str(Path(__file__).resolve().parent.parent / ".scratch" / "sf1x")

pytestmark = [
    pytest.mark.skipif(
        not os.path.isdir(BIG),
        reason="10x replica absent — run scripts/make_scale_replica.py",
    ),
    pytest.mark.skipif(
        os.environ.get("SPARK_GRAFT_SKIP_SCALING") == "1",
        reason="SPARK_GRAFT_SKIP_SCALING=1",
    ),
]


@pytest.fixture(scope="module")
def rehearsal(spark):
    from scripts.bench_scaling import run_rehearsal

    return run_rehearsal(spark, SMALL, BIG, factor=10.0, verbose=False)


def test_every_query_within_scaling_bound(rehearsal):
    bad = [r for r in rehearsal if not r["ok"]]
    assert not bad, f"queries over their scaling bound: {bad}"


def test_worst_plans_are_linear_not_quadratic(rehearsal):
    """The round-4 `weak` plans after their fixes: a 10x corpus must
    not cost anywhere near 100x. Bound 2x the generic linear slack to
    absorb co-tenant load — catching quadratic regressions, not jitter."""
    watch = {
        "etl_decile_report",
        "events_rfm_segments",
        "dedup_containment",
        "dedup_containment_capped",
        "dedup_ngram_jaccard",
        "dedup_groups",
    }
    rows = {r["query"]: r for r in rehearsal if r["query"] in watch}
    assert set(rows) == watch
    for name, r in rows.items():
        assert r["ratio"] <= 30.0, (name, r)
