"""Cross-engine exact aggregation helpers (leaf module — safe to import
from operators, streaming, and plans alike).

Floating-point aggregates are never summed as doubles: each addend is
cast to DECIMAL first, summed exactly (decimal addition is associative,
so partition/shuffle order is irrelevant), and cast back to DOUBLE.
Default scale 6: products of up-to-three 2-decimal money columns are
exact at 6 decimals, so the cast does not round at all and Spark and
DuckDB (which round doubles differently at midpoints) see identical
values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: str | Column, scale: int = 6, prec: int = 28) -> Column:
    """Order-independent exact sum of a float column, returned as double."""
    return F.sum(_c(col).cast(f"decimal({prec},{scale})")).cast("double")


def dsum_sql(expr: str, scale: int = 6, prec: int = 28) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({prec},{scale}))) AS DOUBLE)"


def davg(col: str | Column, scale: int = 6, prec: int = 28) -> Column:
    """Exact-sum average: identical doubles in Spark and DuckDB."""
    return dsum(col, scale, prec) / F.count(_c(col))


def davg_sql(expr: str, scale: int = 6, prec: int = 28) -> str:
    return f"({dsum_sql(expr, scale, prec)} / COUNT({expr}))"


def ts(lit: str) -> Column:
    """Timestamp-NTZ literal (no timezone dependence)."""
    return F.lit(lit).cast("timestamp_ntz")


def ts_sql(lit: str) -> str:
    return f"TIMESTAMP '{lit}'"


def dmean(col: str | Column, scale: int = 6, prec: int = 28) -> Column:
    """Midpoint-free rounded mean of a scale-exact column, for use
    INSIDE an agg: ROUND(sum/count, scale) on doubles sits exactly on
    decimal midpoints whenever the integer-unit sum is ≡ count/2 (mod
    count) — common for means of already-rounded values — and Spark and
    DuckDB resolve the unrepresentable midpoint double differently.
    This computes the mean entirely in integers: exact DECIMAL sum ->
    integer units -> half-away-from-zero integer division -> back to
    DOUBLE, so both engines produce the identical double. SQL twin:
    dmean_sql.

    Caveat: Spark evaluates the integer division as decimal division +
    floor, whose quotient is itself rounded at scale >= 6 — exact while
    the group has < 10^6 rows (the quotient then sits >= 1e-6 away from
    any integer); beyond that the guarantee degrades to ±1 final unit."""
    unit = 10**scale
    s = (F.sum(_c(col).cast(f"decimal({prec},{scale})")) * unit).cast(
        f"decimal({prec},0)"
    )
    n = F.count(_c(col)).cast(f"decimal({prec},0)")
    two_n = n * 2
    pos = F.floor((s * 2 + n) / two_n)
    neg = -F.floor((s * -2 + n) / two_n)
    return (
        F.when(s < 0, neg).otherwise(pos).cast("double") / F.lit(float(unit))
    )


def dmean_sql(expr: str, scale: int = 6, prec: int = 28) -> str:
    unit = 10**scale
    s = f"CAST(SUM(CAST(({expr}) AS DECIMAL({prec},{scale}))) * {unit} AS HUGEINT)"
    n = f"COUNT({expr})"
    return (
        f"(CAST(CASE WHEN {s} < 0 "
        f"THEN -(({s} * -2 + {n}) // (2 * {n})) "
        f"ELSE (({s} * 2 + {n}) // (2 * {n})) END AS DOUBLE) / {unit}.0)"
    )
