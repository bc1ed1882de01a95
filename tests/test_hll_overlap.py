"""Error bound for the HLL audience-overlap sketch twin: the
inclusion–exclusion estimate must track the exact pairwise overlap
within a few percent of the union size at both test scales."""

from __future__ import annotations

import pytest


@pytest.mark.parametrize("sf_rel", ["sf0.001", "sf0.01"])
def test_hll_overlap_error_bound(spark, sf_rel):
    import __spark_entry__ as E

    sf = f"/root/testdata/{sf_rel}"
    exact = {
        (r.type_a, r.type_b): r
        for r in E.queries()["events_audience_overlap"](spark, sf).collect()
    }
    approx = {
        (r.type_a, r.type_b): r
        for r in E.queries()["events_audience_overlap_hll"](spark, sf).collect()
    }
    assert set(exact) == set(approx)  # same pair coverage
    for pair, ex in exact.items():
        ap = approx[pair]
        union = ex.n_a + ex.n_b - ex.n_both
        # lgK=12 -> ~1.6% std error per sketch; inclusion-exclusion
        # stacks three estimates, so bound at 8% of the union (+2 for
        # tiny sets where one bucket is the whole error)
        tol = max(2.0, 0.08 * union)
        assert abs(ap.n_both_est - ex.n_both) <= tol, (pair, ap, ex)
        assert abs(ap.n_a_est - ex.n_a) <= max(2.0, 0.05 * ex.n_a)
        assert abs(ap.n_b_est - ex.n_b) <= max(2.0, 0.05 * ex.n_b)
