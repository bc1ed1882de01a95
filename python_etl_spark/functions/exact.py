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


def _idiv(a: Column, b: Column) -> Column:
    """Exact integral division a // b for NON-NEGATIVE decimal-integer
    columns (b > 0): ``(a - a % b) / b``. Decimal remainder is exact,
    so the division's numerator is exactly divisible and the quotient
    an exactly-representable integer — no rounded-quotient-then-floor
    divergence (Spark rounds decimal quotients to a finite scale; a
    true quotient within half an ulp of an integer would flip
    ``floor``). Matches DuckDB's native integral ``//``."""
    return ((a - a % b) / b).cast("decimal(38,0)")


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

    The integer division is computed EXACTLY via ``(a - a % b) / b``
    (decimal remainder is exact, so the division's operand is exactly
    divisible and its integer quotient representable) — unlike
    ``floor(a / b)``, whose decimal quotient Spark first rounds to a
    finite scale, flipping the floor when the true quotient sits within
    half an ulp of an integer. No group-size bound needed; DuckDB's
    ``//`` twin is integral division natively."""
    unit = 10**scale
    s = (F.sum(_c(col).cast(f"decimal({prec},{scale})")) * unit).cast(
        f"decimal({prec},0)"
    )
    n = F.count(_c(col)).cast(f"decimal({prec},0)")
    two_n = n * 2
    pos = _idiv(s * 2 + n, two_n)
    neg = -_idiv(s * -2 + n, two_n)
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


def dround_div(
    num: str | Column, den: str | Column, scale: int = 6, in_scale: int = 6
) -> Column:
    """Midpoint-free ROUND(num/den, scale) for two already
    ``in_scale``-exact double columns (e.g. decimal-summed money):
    both are lifted to exact integer units, and the rounded quotient
    is computed with half-away-from-zero integer division — identical
    doubles on both engines, where ROUND on the double quotient flips
    at decimal midpoints. Requires den != 0. SQL twin: dround_div_sql.

    The integer lift recovers value*10^in_scale via ROUND(x, 0) on the
    double — exact while |value| < ~10^8 at in_scale 6 (the double's
    ulp error stays below half an integer unit). For larger magnitudes
    pass a smaller in_scale that still makes the inputs exact. The
    integer division itself is exact (``_idiv``, not floor-of-rounded
    -quotient), so no denominator-magnitude bound applies."""
    u_in, u_out = 10**in_scale, 10**scale
    p = F.round(_c(num) * u_in, 0).cast("decimal(38,0)") * u_out
    q = F.round(_c(den) * u_in, 0).cast("decimal(38,0)")
    mag = _idiv(F.abs(p) * 2 + F.abs(q), F.abs(q) * 2)
    sign = F.when((p < 0) != (q < 0), F.lit(-1)).otherwise(F.lit(1))
    return (sign * mag).cast("double") / F.lit(float(u_out))


def dround_div_sql(
    num: str, den: str, scale: int = 6, in_scale: int = 6
) -> str:
    u_in, u_out = 10**in_scale, 10**scale
    p = f"(CAST(ROUND(({num}) * {u_in}, 0) AS HUGEINT) * {u_out})"
    q = f"CAST(ROUND(({den}) * {u_in}, 0) AS HUGEINT)"
    mag = f"((ABS({p}) * 2 + ABS({q})) // (ABS({q}) * 2))"
    sign = f"(CASE WHEN (({p}) < 0) != (({q}) < 0) THEN -1 ELSE 1 END)"
    return f"(CAST({sign} * {mag} AS DOUBLE) / {u_out}.0)"
