"""READ face of the registered ``versioned_table`` format (r11
verdict #2): ``spark.read.format("versioned_table").load(root)`` with
``versionAsOf`` / ``timestampAsOf`` time travel — the missing half of
the lakehouse symmetry. The format could already be WRITTEN by any
vanilla-Spark producer (``df.write.format("versioned_table")``), but
reads required the library (:class:`VersionedTable.read`), locking out
SQL views, BI tools, and consumers that can only say
``spark.read.format(...)``.

Semantics are held to the library read path (the oracled twin query
``etl_format_read`` pins hash-equality): the snapshot's commit dirs
are planned driver-side from manifest METADATA only (one
InputPartition per parquet file — scan parallelism == file count, the
WarcDataSource / table_changes pattern, no driver data path), and
executors conform each file to the snapshot schema exactly like
``_read_snapshot_subset``: rename mapping for pre-rename files,
retired (dropped) columns projected out, per-file CAST to the widened
schema (pre-evolution files null-fill new columns), hive partition
values recovered from ``name=value`` path segments with Spark-shaped
type inference, and deletion vectors anti-joined null-safely — each
tombstone set scoped to the dirs that existed when it was committed,
evaluated executor-side by DuckDB over the Arrow batch (tombstone
sets are small by construction: bounded delete/merge outputs).

Time travel: ``versionAsOf`` (commit version) or ``timestampAsOf``
(epoch seconds or ISO-8601, resolved through the manifest's monotone
commit stamps — the same walk as ``VersionedTable.read_as_of``); both
together are refused, Delta's rule. The schema is resolved AS OF the
requested version, so time travel below a schema evolution surfaces
the old schema.

Scale posture: this face is the INTERCHANGE path (one task per file,
pure map, zero shuffles, no driver bytes). Heavy analytics should
still use ``VersionedTable.read`` — a native Catalyst parquet scan
with predicate pushdown, column pruning, and dir/file skipping via
``read_pruned``; the Python DataSource API offers none of those.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSourceReader, InputPartition

from python_etl_spark.sources.table_changes import (
    _infer_part_type,
    _parquet_files,
    _part_value,
)


class _SnapshotFilePartition(InputPartition):
    def __init__(
        self,
        path: str | None,
        renames: dict | None,
        drops: list[str] | None,
        dv_dirs: tuple[str, ...] = (),
    ):
        self.path = path  # None: empty-snapshot sentinel
        self.renames = renames
        self.drops = drops
        self.dv_dirs = dv_dirs


def resolve_version(root: str, options) -> int:
    """The snapshot version the options ask for: ``versionAsOf`` wins,
    ``timestampAsOf`` resolves via the manifest's monotone commit
    stamps, default latest. Both together refused (Delta's rule)."""
    from python_etl_spark.sinks.table import VersionedTable

    t = VersionedTable(root)
    sv = options.get("versionAsOf") or options.get("versionasof")
    ts = options.get("timestampAsOf") or options.get("timestampasof")
    if sv is not None and ts is not None:
        raise ValueError("pass versionAsOf OR timestampAsOf, not both")
    if sv is not None:
        return int(sv)
    if ts is not None:
        try:
            t0 = float(ts)
        except ValueError:
            from datetime import datetime, timezone

            dt = datetime.fromisoformat(ts)
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=timezone.utc)
            t0 = dt.timestamp()
        return t.version_as_of(t0)
    v = t.latest_version()
    if v is None:
        raise FileNotFoundError(f"no committed version at {root}")
    return v


def snapshot_struct(root: str, version: int):
    """The snapshot's Spark schema AS OF ``version``, computed from
    metadata + one parquet FOOTER only (no Spark job): the recorded
    widened schema when the table ever evolved, else the newest dir's
    footer schema conformed through the rename/drop mapping; hive
    partition columns (path-only) appended with Spark-shaped type
    inference so the format read matches the library read's types."""
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema
    from pyspark.sql.types import StructField, StructType

    from python_etl_spark.sinks.table import VersionedTable

    t = VersionedTable(root)
    m = t._read_manifest(version)
    _evolved, wjson, renames, drops, _cons, _pby = t._evolution_state(
        version
    )
    if wjson is not None:
        st = StructType.fromJson(json.loads(wjson))
        if drops:
            st = StructType([f for f in st.fields if f.name not in drops])
    else:
        files = []
        for d in reversed(m["data_dirs"]):
            files = _parquet_files(d)
            if files:
                break
        if not files:
            raise FileNotFoundError(
                f"snapshot v{version} of {root} has no parquet files"
            )
        st = from_arrow_schema(pq.ParquetFile(files[-1]).schema_arrow)
        if renames:
            st = StructType(
                [
                    next(
                        (
                            type(f)(logical, f.dataType, True)
                            for logical, aliases in renames.items()
                            if f.name in aliases and logical not in st.names
                        ),
                        f,
                    )
                    for f in st.fields
                ]
            )
        if drops:
            st = StructType([f for f in st.fields if f.name not in drops])
    part_cols = [
        c for c in t.partition_columns(version) if c not in st.names
    ]
    if part_cols:
        samples: dict[str, list] = {c: [] for c in part_cols}
        for d in m["data_dirs"]:
            for f in _parquet_files(d):
                for c in part_cols:
                    if len(samples[c]) < 256:
                        samples[c].append(_part_value(f, c))
        for col in part_cols:
            st = st.add(StructField(col, _infer_part_type(samples[col])))
    # every column nullable: pre-evolution files NULL-FILL additive
    # columns (a lit()-typed field recorded non-nullable in the
    # widened schema would make Spark NPE on those rows), and hive
    # __HIVE_DEFAULT_PARTITION__ dirs null partition values — the
    # posture of Spark's own parquet reads
    return StructType(
        [StructField(f.name, f.dataType, True) for f in st.fields]
    )


def plan_snapshot_partitions(
    root: str, version: int
) -> list[_SnapshotFilePartition]:
    """One partition per data file of the snapshot, each carrying the
    conform spec (rename mapping, retired names) and the DV dirs whose
    tombstones apply to ITS commit dir — driver-side metadata walk,
    zero data bytes."""
    from python_etl_spark.sinks.table import VersionedTable

    t = VersionedTable(root)
    m = t._read_manifest(version)
    _evolved, _wjson, renames, drops, _cons, _pby = t._evolution_state(
        version
    )
    renames = renames or None
    drops_l = sorted(drops) if drops else None
    dvs = m.get("dvs", [])
    parts: list[_SnapshotFilePartition] = []
    for d in m["data_dirs"]:
        dv_key = tuple(
            sorted(e["dir"] for e in dvs if d in e["deleted"])
        )
        for f in _parquet_files(d):
            parts.append(
                _SnapshotFilePartition(f, renames, drops_l, dv_key)
            )
    if not parts:  # empty snapshot: Spark still needs >= 1 split
        parts.append(_SnapshotFilePartition(None, None, None))
    return parts


def read_snapshot_partition(partition: _SnapshotFilePartition, spark_schema):
    """Executor-side: one parquet file -> Arrow batches conformed to
    the snapshot schema, deletion-vector tombstones anti-joined
    null-safely (DuckDB ``IS NOT DISTINCT FROM`` over the Arrow
    batch; tombstone columns may be a key SUBSET — keyed DVs)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    if partition is None or partition.path is None:
        return
    arrow_schema = to_arrow_schema(spark_schema)
    tbl = pq.read_table(partition.path)
    if partition.renames:
        cols = set(tbl.column_names)
        new_names = []
        for name in tbl.column_names:
            logical = next(
                (
                    lg
                    for lg, aliases in partition.renames.items()
                    if name in aliases and lg not in cols
                ),
                name,
            )
            new_names.append(logical)
        tbl = tbl.rename_columns(new_names)
    n = len(tbl)
    arrays = []
    for field in arrow_schema:
        if field.name in tbl.column_names:
            arrays.append(
                tbl.column(field.name).cast(field.type).combine_chunks()
            )
        elif f"/{field.name}=" in partition.path:
            raw = _part_value(partition.path, field.name)
            if raw is None:
                arrays.append(pa.nulls(n, field.type))
            else:
                arrays.append(
                    pa.array([raw] * n, pa.string()).cast(field.type)
                )
        else:  # pre-evolution file: null-fill the new column
            arrays.append(pa.nulls(n, field.type))
    out = pa.Table.from_arrays(arrays, schema=arrow_schema)
    for dvdir in partition.dv_dirs:
        tomb_files = _parquet_files(dvdir)
        if not tomb_files:
            continue
        tomb = pa.concat_tables(
            [pq.read_table(f) for f in tomb_files],
            promote_options="default",
        )
        if partition.renames:
            cols = set(tomb.column_names)
            tomb = tomb.rename_columns(
                [
                    next(
                        (
                            lg
                            for lg, aliases in partition.renames.items()
                            if name in aliases and lg not in cols
                        ),
                        name,
                    )
                    for name in tomb.column_names
                ]
            )
        if partition.drops:
            keep = [
                c for c in tomb.column_names if c not in partition.drops
            ]
            tomb = tomb.select(keep)
        key_cols = [c for c in tomb.column_names if c in out.column_names]
        if not key_cols:
            continue
        import duckdb

        con = duckdb.connect()
        con.register("t", out)
        con.register("tomb", tomb.select(key_cols))
        cond = " AND ".join(
            f'f."{c}" IS NOT DISTINCT FROM tomb."{c}"' for c in key_cols
        )
        out = con.execute(
            f"SELECT f.* FROM t AS f WHERE NOT EXISTS "
            f"(SELECT 1 FROM tomb WHERE {cond})"
        ).arrow()
        # duckdb round-trips may relax types (e.g. timestamp units):
        # conform back to the snapshot schema
        out = out.cast(arrow_schema)
    yield from out.to_batches()


class VersionedTableSnapshotReader(DataSourceReader):
    """Batch reader behind ``spark.read.format("versioned_table")``.
    Options: ``path`` (table root), ``versionAsOf``, ``timestampAsOf``
    (mutually exclusive; default latest)."""

    def __init__(self, options, schema):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("versioned_table read requires a path")
        self.version = resolve_version(self.root, options)
        self.spark_schema = schema

    def partitions(self):
        return plan_snapshot_partitions(self.root, self.version)

    def read(self, partition):
        yield from read_snapshot_partition(partition, self.spark_schema)
