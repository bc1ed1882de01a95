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
