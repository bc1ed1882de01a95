"""Plan registry + cross-engine exactness helpers.

Every query is registered under a stable name together with a DuckDB
oracle SQL string (or None for ops that SQL can't express — those get a
rows-only driver check and an exact pytest oracle instead).

Exactness strategy: floating-point aggregates are never summed as
doubles. Both the Spark plan and the DuckDB oracle cast each addend to
``DECIMAL(p,s)`` first, sum exactly (decimal addition is associative, so
partition/shuffle order is irrelevant), and cast the final value back to
DOUBLE. Derived ratios divide those identical doubles, so the two
engines agree bit-for-bit. Cast-to-decimal ties cannot occur for scale
> 0 (decimal midpoints like x.005 are not representable as binary
doubles), so both engines round identically.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: str | Column, scale: int = 6, prec: int = 28) -> Column:
    """Order-independent exact sum of a float column, returned as double.

    Default scale 6: products of up-to-three 2-decimal money columns are
    exact at 6 decimals, so the decimal cast does not round at all and
    both engines see the identical value. (Scale-2 casts of such
    products hit decimal midpoints, which Spark — shortest-repr
    HALF_UP — and DuckDB — binary-value rounding — resolve
    differently.)"""
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


def REVENUE() -> Column:
    """Lazy: building a Column requires an active SparkContext, and the
    driver imports this module before creating its session."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


REVENUE_SQL = "l_extendedprice * (1 - l_discount)"
