"""Distributed as-of (point-in-time) join — backward, forward, nearest.

Spark has no native ASOF JOIN. The naive formulations either explode
(inequality theta-join) or collect (driver loop). This implementation
uses the union-sort-fill pattern, which scales to arbitrarily large
inputs with exactly ONE shuffle on the join key:

1. Union left and right rows into one frame tagged by side.
2. Sort within each key partition by (timestamp, side).
3. Window-fill the right-side payload onto left rows:
   * ``backward`` — right rows sort BEFORE left rows at equal
     timestamps; ``last(ignorenulls)`` over unbounded-preceding carries
     the most recent right values forward (match: right_ts <= left_ts).
     Equivalent to DuckDB ``ASOF LEFT JOIN ... ON l.ts >= r.ts``.
   * ``forward`` — right rows sort AFTER left rows at equal
     timestamps; ``first(ignorenulls)`` over unbounded-following pulls
     the next right values back (match: right_ts >= left_ts).
     Equivalent to DuckDB ``ASOF LEFT JOIN ... ON l.ts <= r.ts``.
   * ``nearest`` — both fills over ONE sort order (right before left,
     so the equal-timestamp match lands in the backward branch with
     delta zero), then a per-row interval comparison picks the closer
     side; ties prefer backward, matching pandas ``merge_asof``.

All three run in the same single shuffle; ``nearest`` adds a second
window pass over the already-sorted partition, not a second exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DIRECTIONS = ("backward", "forward", "nearest")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    if direction not in _DIRECTIONS:
        raise ValueError(
            f"direction must be one of {_DIRECTIONS}; got {direction!r}"
        )
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

    # side codes order right rows before left (backward/nearest) or
    # after left (forward) at equal timestamps, so the equality case
    # always falls inside the fill window.
    right_side = 2 if direction == "forward" else 0
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
        F.lit(right_side).alias("__side"),
        *[F.lit(None).cast(left_types[c]).alias(c) for c in left_payload],
        *[F.col(c) for c in right_cols],
    )
    both = l_side.unionByName(r_side)
    order = Window.partitionBy(*keys).orderBy("__ts", "__side")
    w_back = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    # Fill ONE struct of all right payload columns: for right-side rows
    # the struct itself is non-null even when individual fields are
    # null, so last/first(ignorenulls) always selects the MATCHED row's
    # struct and every unpacked column comes from that same row —
    # carrying that row's genuine NULLs (pandas merge_asof semantics) —
    # instead of per-column fills stitching values from different
    # right rows when the matched row holds a NULL.
    rstruct = F.when(
        F.col("__side") != 1, F.struct(*[F.col(c) for c in right_cols])
    )
    if direction == "backward":
        filled_struct = F.last(rstruct, ignorenulls=True).over(w_back)
    elif direction == "forward":
        filled_struct = F.first(rstruct, ignorenulls=True).over(w_fwd)
    else:  # nearest
        # carry the matched right timestamp for the distance test; the
        # equal-ts case is the backward branch at delta zero, which
        # always wins the <= tie — so missing it in the forward branch
        # (right sorts before left here) cannot change the result.
        rts = F.when(F.col("__side") != 1, F.col("__ts"))
        bts = F.last(rts, ignorenulls=True).over(w_back)
        fts = F.first(rts, ignorenulls=True).over(w_fwd)
        use_back = F.when(bts.isNull(), F.lit(False)).otherwise(
            fts.isNull() | ((F.col("__ts") - bts) <= (fts - F.col("__ts")))
        )
        filled_struct = F.when(
            use_back, F.last(rstruct, ignorenulls=True).over(w_back)
        ).otherwise(F.first(rstruct, ignorenulls=True).over(w_fwd))

    filled = both.select(
        *keys,
        "__ts",
        "__side",
        *[F.col(c) for c in left_payload],
        filled_struct.alias("__r"),
    )
    return filled.where(F.col("__side") == 1).select(
        *keys,
        *left_payload,
        *[F.col("__r").getField(c).alias(c) for c in right_cols],
    )
