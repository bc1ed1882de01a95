"""``table_changes``: a VersionedTable's row-level change feed as a
REGISTERED Spark data source whose stream offsets are COMMIT VERSIONS
(the Delta ``table_changes``/``readChangeFeed`` shape; VERDICT r9 #5).

The round-9 streaming fold consumed the feed as a file-source glob over
``data/cdf-*`` — workable, but its offsets are file names, so a vacuum
or compaction racing the stream can surface dirs out of commit order,
and a re-baseline barrier (overwrite, ``track_changes=False``) is
silently invisible. Here the offset IS the commit version: each
micro-batch covers exactly the manifests in ``(start, end]``, appends
surface as typed ``insert`` rows, merge/delete commits replay their
persisted cdf files, compactions contribute nothing, and a barrier op
inside the pending range raises — the stream fails loudly telling the
consumer to re-baseline, exactly like the batch ``row_changes``.

Scale shape: ``partitions()`` plans ONE InputPartition per change
file (driver-side metadata walk, O(commits in range)); ``read`` runs
on executors and yields Arrow record batches straight from the parquet
file — no driver data path, the WarcDataSource pattern. Hive-
partitioned appends recover their partition-column values from the
``name=value`` path segments.

Usage::

    from python_etl_spark.sources.table_changes import (
        TableChangesDataSource,
    )
    spark.dataSource.register(TableChangesDataSource)
    feed = (spark.readStream.format("table_changes")
            .option("startingVersion", 0)   # exclusive, like row_changes
            .load(table_root))
    # batch face: the whole feed of a version range
    spark.read.format("table_changes").option("startingVersion", -1) \
        .load(table_root)
"""

from __future__ import annotations

import os
import re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

CHANGE_TYPE = "_change_type"
COMMIT_VERSION = "_commit_version"


class _ChangeFilePartition(InputPartition):
    def __init__(self, path: str, change_type: str | None, version: int):
        self.path = path
        self.change_type = change_type  # None: the file carries its own
        self.version = version


def _parquet_files(d: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(d):
        for f in sorted(files):
            if f.endswith(".parquet"):
                out.append(os.path.join(root, f))
    return out


def _plan_partitions(
    root: str, start_v: int, end_v: int
) -> list[_ChangeFilePartition]:
    """One partition per change file for commits in ``(start_v,
    end_v]`` — the driver-side metadata walk. Raises on re-baseline
    barriers (overwrite / feed-less merge/delete / restore), surfacing
    them as STREAM ERRORS instead of silent gaps."""
    from python_etl_spark.sinks.table import VersionedTable

    t = VersionedTable(root)
    parts: list[_ChangeFilePartition] = []
    prev_dirs: set[str] = (
        set(t._read_manifest(start_v)["data_dirs"]) if start_v >= 0 else set()
    )
    for v in range(max(start_v, -1) + 1, end_v + 1):
        m = t._read_manifest(v)
        op = m.get("op")
        if op in ("append", "create"):
            for d in m["data_dirs"]:
                if d not in prev_dirs:
                    for f in _parquet_files(d):
                        parts.append(_ChangeFilePartition(f, "insert", v))
        elif op in ("compact", "compact_bins"):
            pass  # row-preserving rewrite: nothing to emit
        elif op in ("merge", "delete", "delete_mor") and m.get("cdf_dir"):
            for f in _parquet_files(m["cdf_dir"]):
                parts.append(_ChangeFilePartition(f, None, v))
        else:
            raise ValueError(
                f"table_changes: commit v{v} is a '{op}' with no change "
                f"feed (overwrite, restore, or track_changes=False) — "
                f"re-baseline the consumer from the v{v} snapshot and "
                f"restart with startingVersion={v}"
            )
        prev_dirs = set(m["data_dirs"])
    return parts


def _feed_struct(root: str):
    """Data schema from the newest commit dir's parquet footer (the
    most evolved one) + the two change columns."""
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema
    from pyspark.sql.types import LongType, StringType, StructField

    from python_etl_spark.sinks.table import VersionedTable

    t = VersionedTable(root)
    m = t._read_manifest()
    files = []
    for d in reversed(m["data_dirs"]):
        files = _parquet_files(d)
        if files:
            break
    if not files:
        raise FileNotFoundError(f"no parquet files under {root}")
    st = from_arrow_schema(pq.ParquetFile(files[-1]).schema_arrow)
    # hive layout: partition columns live in the paths, not the file
    from pyspark.sql.types import StringType as _S

    for col in t.partition_columns():
        if col not in st.names:
            st = st.add(StructField(col, _S()))
    st = st.add(StructField(CHANGE_TYPE, StringType()))
    st = st.add(StructField(COMMIT_VERSION, LongType()))
    return st


def _read_partition(partition: _ChangeFilePartition, spark_schema):
    """Executor-side: one parquet file -> Arrow batches conformed to
    the feed schema (missing columns null-filled or recovered from
    hive ``name=value`` path segments; change columns appended)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(spark_schema)
    tbl = pq.read_table(partition.path)
    n = len(tbl)
    arrays = []
    for field in arrow_schema:
        if field.name == CHANGE_TYPE and partition.change_type is not None:
            arrays.append(
                pa.array([partition.change_type] * n, pa.string())
            )
        elif field.name == COMMIT_VERSION:
            arrays.append(pa.array([partition.version] * n, pa.int64()))
        elif field.name in tbl.column_names:
            arrays.append(
                tbl.column(field.name).cast(field.type).combine_chunks()
            )
        else:
            mm = re.search(
                f"/{re.escape(field.name)}=([^/]+)/", partition.path
            )
            if mm:  # hive partition value from the path
                arrays.append(
                    pa.array([mm.group(1)] * n, pa.string()).cast(
                        field.type
                    )
                )
            else:  # pre-evolution file: surface the column as NULL
                arrays.append(pa.nulls(n, field.type))
    out = pa.Table.from_arrays(arrays, schema=arrow_schema)
    yield from out.to_batches()


class _TableChangesBatchReader(DataSourceReader):
    def __init__(self, options, schema):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("table_changes requires a table root path")
        self.start_v = int(options.get("startingVersion", -1))
        self.end_v = options.get("endingVersion")
        self.spark_schema = schema

    def partitions(self):
        from python_etl_spark.sinks.table import VersionedTable

        end = (
            int(self.end_v)
            if self.end_v is not None
            else VersionedTable(self.root).latest_version()
        )
        return _plan_partitions(self.root, self.start_v, end)

    def read(self, partition):
        yield from _read_partition(partition, self.spark_schema)


class _TableChangesStreamReader(DataSourceStreamReader):
    """Offsets are commit versions: ``{"version": N}`` = everything up
    to and including manifest N has been processed. latestOffset moves
    to the table's current latest; partitions() plans the manifest
    range exactly, so a checkpoint restart resumes at the right
    version no matter what compaction/vacuum did in between (cdf and
    append dirs are retained while their manifests live)."""

    def __init__(self, options, schema):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("table_changes requires a table root path")
        self.start_v = int(options.get("startingVersion", 0))
        self.spark_schema = schema

    def initialOffset(self) -> dict:
        return {"version": self.start_v}

    def latestOffset(self) -> dict:
        from python_etl_spark.sinks.table import VersionedTable

        v = VersionedTable(self.root).latest_version()
        return {"version": v if v is not None else self.start_v}

    def partitions(self, start: dict, end: dict):
        return _plan_partitions(
            self.root, int(start["version"]), int(end["version"])
        )

    def read(self, partition):
        yield from _read_partition(partition, self.spark_schema)

    def commit(self, end: dict) -> None:
        pass  # retention rides the table's metadata, not the stream


class TableChangesDataSource(DataSource):
    """``spark.dataSource.register(TableChangesDataSource)`` then
    ``spark.read/readStream.format("table_changes").load(root)``.
    Options: ``startingVersion`` (exclusive; stream default 0, batch
    default -1 = include the create), ``endingVersion`` (batch only,
    default latest)."""

    @classmethod
    def name(cls) -> str:
        return "table_changes"

    def schema(self):
        return _feed_struct(self.options.get("path"))

    def reader(self, schema):
        return _TableChangesBatchReader(self.options, schema)

    def streamReader(self, schema):
        return _TableChangesStreamReader(self.options, schema)
