"""Error bounds for the theta-sketch audience set algebra: KMV with
K=128 has ~1/sqrt(K-2) ≈ 8.9% relative std error per estimate; set
operations compound it, so union/intersect/diff are bounded at ~4
sigma against the exact sets. Identity: est_intersect + est_diff uses
one shared theta, so A = (A∩B) + (A\\B) holds for the retained counts
before scaling."""

from __future__ import annotations

import pytest


@pytest.mark.parametrize("sf_rel", ["sf0.001", "sf0.01"])
def test_theta_audience_error_bounds(spark, sf_rel):
    import __spark_entry__ as E

    sf = f"/root/testdata/{sf_rel}"
    exact = {
        (r.type_a, r.type_b): r
        for r in E.queries()["events_audience_overlap"](spark, sf).collect()
    }
    theta = {
        (r.type_a, r.type_b): r
        for r in E.queries()["events_audience_theta"](spark, sf).collect()
    }
    assert set(exact) == set(theta)
    for pair, ex in exact.items():
        th = theta[pair]
        union = ex.n_a + ex.n_b - ex.n_both
        # singles: one sketch, ~9% std error -> 4 sigma + small-set slack
        assert abs(th.est_a - ex.n_a) <= max(3.0, 0.36 * ex.n_a), (pair, th, ex)
        assert abs(th.est_b - ex.n_b) <= max(3.0, 0.36 * ex.n_b), (pair, th, ex)
        assert abs(th.est_union - union) <= max(3.0, 0.36 * union), (pair, th, ex)
        # intersection/difference share theta_ab; their error scales
        # with the UNION size (the sample frame), not their own size
        assert abs(th.est_intersect - ex.n_both) <= max(3.0, 0.36 * union)
        diff_exact = ex.n_a - ex.n_both
        assert abs(th.est_diff - diff_exact) <= max(3.0, 0.36 * union)
