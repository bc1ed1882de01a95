"""Distributed as-of (point-in-time) join.

Spark has no native ASOF JOIN. The naive formulations either explode
(inequality theta-join) or collect (driver loop). This implementation
uses the union-sort-fill pattern, which scales to arbitrarily large
inputs with exactly ONE shuffle on the join key:

1. Union left and right rows into one frame tagged by side.
2. Sort within each key partition by (timestamp, side) — right rows
   sort before left rows at equal timestamps, making the match
   inclusive (right_ts <= left_ts).
3. ``last(value, ignorenulls=True)`` over an unbounded-preceding window
   carries the most recent right-side values forward onto left rows.

Equivalent to DuckDB's ``ASOF LEFT JOIN`` with ``ON key AND l.ts >= r.ts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
) -> DataFrame:
    keys = [on] if isinstance(on, str) else list(on)
    right_cols = right_cols or [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    left_payload = [c for c in left.columns if c not in keys]
    clash = set(left_payload) & set(right_cols)
    if clash:
        raise ValueError(
            f"left/right payload column name collision: {sorted(clash)}; "
            "rename or restrict right_cols"
        )
    right_types = dict(right.dtypes)

    l_side = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_payload],
        *[F.lit(None).cast(right_types[c]).alias(c) for c in right_cols],
    )
    left_types = dict(left.dtypes)
    r_side = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left_types[c]).alias(c) for c in left_payload],
        *[F.col(c) for c in right_cols],
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_side.unionByName(r_side).select(
        *keys,
        "__ts",
        "__side",
        *[F.col(c) for c in left_payload],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in right_cols],
    )
    return filled.where(F.col("__side") == 1).select(
        *keys, *left_payload, *right_cols
    )
