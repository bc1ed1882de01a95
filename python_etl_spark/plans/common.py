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


from python_etl_spark.functions.exact import (  # noqa: F401
    davg,
    davg_sql,
    dsum,
    dsum_sql,
    ts,
    ts_sql,
)


def REVENUE() -> Column:
    """Lazy: building a Column requires an active SparkContext, and the
    driver imports this module before creating its session."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


REVENUE_SQL = "l_extendedprice * (1 - l_discount)"
