"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (q01 pricing summary) on sf0.001.
queries()     — every implemented operator from SURVEY.md §2.
oracle_sql()  — DuckDB-equivalent SQL for the hash-checked subset;
                approximate operators (MinHash-LSH, SimHash, LSH-ANN)
                are rows-only here and exactness-tested in tests/.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from python_etl_spark.plans import ORACLES, QUERIES
from python_etl_spark.session import apply_runtime_confs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    apply_runtime_confs(spark)
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
