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
    bloom_filter_cols: dict[str, int] | None = None,
) -> str:
    """``bloom_filter_cols`` maps column -> expected NDV and turns on
    parquet BLOOM FILTERS for those columns (parquet-mr writer
    options). At 100 TB this is the point-lookup complement to
    min/max pruning: equality predicates on high-cardinality keys
    (doc ids, content hashes, user ids) skip row groups whose bloom
    excludes the value — min/max zones are useless for hash-like
    columns, blooms are the tool. Costs ~1.2 MB per 1M NDV per row
    group; put them on join/lookup keys only."""
    writer = df.write.mode(mode).option("compression", compression)
    for col, ndv in (bloom_filter_cols or {}).items():
        writer = writer.option(
            f"parquet.bloom.filter.enabled#{col}", "true"
        ).option(f"parquet.bloom.filter.expected.ndv#{col}", str(ndv))
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


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> str:
    """Bucketed parquet table (saveAsTable path): pre-shuffles rows into
    ``buckets`` files by hash of ``bucket_cols`` so later joins and
    aggregations on those keys are CO-LOCATED — Spark elides the
    Exchange on both sides (see tests/test_bucketing.py, which asserts
    the shuffle-free plan). ``sort_cols`` additionally sorts within
    buckets, enabling sort-merge joins with no per-task sort.

    At 100 TB this is the difference between shuffling the fact table
    on every join and shuffling it ONCE at ingest."""
    writer = df.write.mode(mode).format("parquet").bucketBy(buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    return table


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
