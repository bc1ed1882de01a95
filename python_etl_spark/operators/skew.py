"""Skew-aware join: explicit key salting.

AQE's skew-join handles most cases at runtime; salting is the static
fallback when one key dominates so heavily that even split shuffle
blocks overload (the classic null-key / celebrity-key problem at
100 TB). The hot side gets a random salt in [0, n); the small side is
replicated n times; the join key becomes (key, salt), spreading one
hot partition over n reducers."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_SALT_SAFE_HOW = {"inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi"}


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Join ``skewed`` (hot keys) to ``other`` (replicated) on ``on``.

    Deterministic salt (hash of the full row via monotonically
    increasing id would break retries; use a stable hash of all
    columns) so task retries produce identical results.

    Only inner/left/left_semi joins are supported: ``other`` is
    replicated ``salt_buckets`` times, so any join type that emits
    unmatched rows of the replicated side (right/full outer, right
    semi/anti) would duplicate them once per salt bucket."""
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in _SALT_SAFE_HOW}:
        raise ValueError(
            f"salted_join supports inner/left/left_semi, not {how!r}: the "
            "replicated side would emit unmatched rows once per salt bucket"
        )
    salt = (
        F.abs(F.xxhash64(*[F.col(c) for c in skewed.columns])) % salt_buckets
    ).alias("__salt")
    left = skewed.select("*", salt)
    right = other.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("__salt")
    )
    joined = left.join(right, [on, "__salt"], how)
    return joined.drop("__salt")
