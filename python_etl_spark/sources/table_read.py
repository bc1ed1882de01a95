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

from pyspark.sql.datasource import (
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

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


def _admits(stat, lo, hi) -> bool:
    """Conservative [min, max]-vs-range intersection test: True (read
    the file) unless the stats PROVE a miss; type disagreements keep
    the file (the read_pruned posture)."""
    if stat is None:
        return True
    dlo, dhi = stat
    try:
        if lo is not None and dhi < lo:
            return False
        if hi is not None and dlo > hi:
            return False
    except TypeError:
        return True
    return True


def plan_snapshot_partitions(
    root: str, version: int, ranges: dict | None = None
) -> list[_SnapshotFilePartition]:
    """One partition per data file of the snapshot, each carrying the
    conform spec (rename mapping, retired names) and the DV dirs whose
    tombstones apply to ITS commit dir — driver-side metadata walk,
    zero data bytes.

    ``ranges`` (``{col: (lo, hi)}``, from pushed-down filters) turns
    on PLAN-TIME DATA SKIPPING: dirs whose manifest [min, max] for a
    bounded column cannot intersect are never walked, files whose
    per-file footer stats (the manifest ``file_stats``) or hive
    ``name=value`` path value provably miss are never planned —
    Spark's residual filter still runs, so skipping only ever has to
    be conservative."""
    from python_etl_spark.sinks.table import VersionedTable

    t = VersionedTable(root)
    m = t._read_manifest(version)
    _evolved, _wjson, renames, drops, _cons, _pby = t._evolution_state(
        version
    )
    renames = renames or None
    drops_l = sorted(drops) if drops else None
    dvs = m.get("dvs", [])
    ranges = ranges or {}
    dir_stats = m.get("dir_stats", {}) if ranges else {}
    file_stats = m.get("file_stats", {}) if ranges else {}
    parts: list[_SnapshotFilePartition] = []
    for d in m["data_dirs"]:
        if ranges and not all(
            _admits(dir_stats.get(d, {}).get(c), lo, hi)
            for c, (lo, hi) in ranges.items()
        ):
            continue  # whole commit dir provably misses
        dv_key = tuple(
            sorted(e["dir"] for e in dvs if d in e["deleted"])
        )
        fstats = file_stats.get(d, {})
        for f in _parquet_files(d):
            if ranges:
                rel = os.path.relpath(f, d)
                cols = fstats.get(rel, {}).get("cols", {})
                ok = True
                for c, (lo, hi) in ranges.items():
                    if not _admits(cols.get(c), lo, hi):
                        ok = False
                        break
                    if f"/{c}=" in f:  # hive partition value
                        raw = _part_value(f, c)
                        if raw is not None:
                            # typed compare: numeric when both sides
                            # parse (path values are strings, the
                            # filter may be numeric), else lexical;
                            # any disagreement keeps the file
                            try:
                                v = float(raw)
                                flo = None if lo is None else float(lo)
                                fhi = None if hi is None else float(hi)
                            except (TypeError, ValueError):
                                v, flo, fhi = raw, lo, hi
                            if not _admits((v, v), flo, fhi):
                                ok = False
                                break
                if not ok:
                    continue
            parts.append(
                _SnapshotFilePartition(f, renames, drops_l, dv_key)
            )
    if not parts:  # empty snapshot/plan: Spark still needs >= 1 split
        parts.append(_SnapshotFilePartition(None, None, None))
    return parts


def read_snapshot_partition(
    partition: _SnapshotFilePartition, spark_schema, ranges: dict | None = None
):
    """Executor-side: one parquet file -> Arrow batches conformed to
    the snapshot schema, deletion-vector tombstones anti-joined
    null-safely (DuckDB ``IS NOT DISTINCT FROM`` over the Arrow
    batch; tombstone columns may be a key SUBSET — keyed DVs).
    Pushed-down ranges become pyarrow scan filters (row-group pruning
    + row filtering) for the FILE's own columns; renamed/hive/evolved
    columns stay Spark-side residuals."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    if partition is None or partition.path is None:
        return
    arrow_schema = to_arrow_schema(spark_schema)
    flt = None
    if ranges:
        pf_names = set(pq.ParquetFile(partition.path).schema_arrow.names)
        conds = []
        for c, (lo, hi) in ranges.items():
            if c not in pf_names:
                continue  # hive/renamed/evolved: Spark re-filters
            if lo is not None:
                conds.append((c, ">=", lo))
            if hi is not None:
                conds.append((c, "<=", hi))
        flt = conds or None
    try:
        tbl = pq.read_table(partition.path, filters=flt)
    except (pa.ArrowInvalid, pa.ArrowTypeError, OSError):
        # type-incompatible pushed bound (e.g. string bound on an int
        # column): fall back to the unfiltered scan — Spark's residual
        # keeps the result exact
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


class VersionedTableStreamReader(DataSourceStreamReader):
    """STREAMING read face of the registered format (the Delta
    streaming-source shape): ``spark.readStream.format(
    "versioned_table").load(root)`` delivers the table's CURRENT
    SNAPSHOT as the first micro-batch, then each later batch carries
    the rows of newly APPENDED commits — plain data rows, no change
    columns (CDC consumers use the ``table_changes`` source). A
    non-append data commit inside a pending range (merge / delete /
    compact / overwrite / restore) RAISES: appended-dirs tailing
    stops meaning "new rows" there, and the stream fails loudly
    telling the consumer to re-baseline, exactly like ``changes()``.
    Metadata-only commits (constraints, rename/drop, partition
    evolution) pass through — the conform happens per file.

    Offsets are ``{"version": N, "snap": bool}``: ``snap=False``
    marks the initial-snapshot batch still pending; ``partitions``
    for that batch plans the FULL snapshot at the range end (legal
    because the range guard admits only appends, so end's dir list is
    start's plus the new dirs). ``startingVersion`` (exclusive) skips
    the snapshot phase and tails from a known version — the
    checkpointed-consumer path. ``maxCommitsPerTrigger`` +
    ``streamId`` bound the TAIL exactly like table_changes (same
    never-self-advance admission contract, same sidecar, same
    unbounded-restart warning without streamId); the snapshot batch
    itself is one batch — bound a huge backfill with startingVersion
    + the capped ``table_changes`` source instead.

    Scale shape: planning is a manifest walk; one InputPartition per
    file; executors conform each file Arrow-side (rename/drop map,
    widened-schema cast, hive path values, DV anti-join for the
    snapshot batch)."""

    def __init__(self, options, schema):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("versioned_table stream read requires a path")
        self.spark_schema = schema
        sv = options.get("startingVersion") or options.get(
            "startingversion"
        )
        self.start_v = int(sv) if sv is not None else None
        mct = options.get("maxCommitsPerTrigger")
        self.max_commits = int(mct) if mct is not None else None
        if self.max_commits is not None and self.max_commits < 1:
            raise ValueError("maxCommitsPerTrigger must be >= 1")
        self.stream_id = options.get("streamId")
        if self.max_commits is not None and not self.stream_id:
            import warnings

            warnings.warn(
                "versioned_table stream: maxCommitsPerTrigger set "
                "without streamId — the FIRST tail batch after a "
                "restart is UNBOUNDED (no sidecar to recover the "
                "position from). Pass .option('streamId', '<name>').",
                stacklevel=2,
            )
        self._pos: int | None = None

    def _sidecar(self) -> str:
        return os.path.join(self.root, "_streams", str(self.stream_id))

    def initialOffset(self) -> dict:
        from python_etl_spark.sinks.table import VersionedTable

        if self.start_v is not None:
            self._pos = self.start_v
            return {"version": self.start_v, "snap": True}
        v = VersionedTable(self.root).latest_version()
        if v is None:
            raise FileNotFoundError(
                f"no committed version at {self.root}"
            )
        self._pos = v
        # snap=False: the snapshot AT v is still owed to the consumer
        return {"version": v, "snap": False}

    def latestOffset(self) -> dict:
        from python_etl_spark.sinks.table import VersionedTable

        v = VersionedTable(self.root).latest_version()
        latest = v if v is not None else -1
        if self.max_commits is None:
            return {"version": latest, "snap": True}
        base = self._pos
        if base is None and self.stream_id:
            try:
                with open(self._sidecar()) as f:
                    base = int(f.read().strip())
            except FileNotFoundError:
                # sidecar never written: commit() is its only writer,
                # so the position provably never advanced past
                # start_v (a crash before the first commit replays
                # the identical bound already in the WAL) — bounding
                # from start_v is safe for fresh streams
                base = self.start_v  # may be None
            except (OSError, ValueError):
                # sidecar EXISTS but is unreadable/corrupt after a
                # restart: the true position is unknown and may sit
                # ABOVE start_v. Bounding from start_v could hand
                # Spark an end BELOW the checkpointed start — the WAL
                # records the regressed offset and a later restart
                # replays already-delivered commits (r12 advice,
                # low). One unbounded batch is the safe degradation,
                # same as the no-streamId restart path.
                base = None
        if base is None:
            return {"version": latest, "snap": True}
        # same never-self-advance contract as table_changes
        return {
            "version": max(base, min(latest, base + self.max_commits)),
            "snap": True,
        }

    def partitions(self, start: dict, end: dict):
        from python_etl_spark.sinks.table import VersionedTable

        s, e = int(start["version"]), int(end["version"])
        pos = max(s, e)
        self._pos = pos if self._pos is None else max(self._pos, pos)
        t = VersionedTable(self.root)
        # range guard: only appends / metadata-only commits may sit in
        # (s, e] — anything else is a re-baseline barrier
        ckpt = t._latest_checkpoint(e) if e >= 0 else None
        summaries = (
            {c["version"]: c.get("op") for c in ckpt["commits"]}
            if ckpt
            else {}
        )
        for v in range(s + 1, e + 1):
            try:
                op = t._read_manifest(v).get("op")
            except FileNotFoundError:
                op = summaries.get(v)
                if op is None:
                    raise
            if op not in (
                "append", "add_constraint", "drop_constraint",
                "rename", "drop", "set_partitioning", "add_column",
                "sync_identity",
            ):
                raise ValueError(
                    f"versioned_table stream: commit v{v} is a "
                    f"'{op}' — appended-dirs tailing breaks across "
                    f"rewrites; re-baseline (restart the stream, or "
                    f"consume the typed feed via table_changes)"
                )
        if not start.get("snap", True):
            # initial-snapshot batch: the full snapshot at e (s's dirs
            # plus the appended ones; DVs of the snapshot apply)
            if e < 0:
                return []
            return plan_snapshot_partitions(self.root, e)
        if e <= s:
            return []
        # tail batch: only the dirs that JOINED the manifest in range
        _ev, _wj, renames, drops, _c, _p = t._evolution_state(e)
        renames = renames or None
        drops_l = sorted(drops) if drops else None
        prev = set(t._read_manifest(s)["data_dirs"]) if s >= 0 else set()
        parts = []
        for v in range(s + 1, e + 1):
            try:
                m = t._read_manifest(v)
            except FileNotFoundError:
                continue  # metadata-only summary: no new dirs
            for d in m["data_dirs"]:
                if d not in prev:
                    for f in _parquet_files(d):
                        parts.append(
                            _SnapshotFilePartition(
                                f, renames, drops_l, ()
                            )
                        )
            prev = set(m["data_dirs"])
        return parts

    def read(self, partition):
        yield from read_snapshot_partition(partition, self.spark_schema)

    def commit(self, end: dict) -> None:
        v = int(end["version"])
        self._pos = v if self._pos is None else max(self._pos, v)
        if not self.stream_id:
            return
        side = self._sidecar()
        os.makedirs(os.path.dirname(side), exist_ok=True)
        tmp = f"{side}.tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, side)


class VersionedTableSnapshotReader(DataSourceReader):
    """Batch reader behind ``spark.read.format("versioned_table")``.
    Options: ``path`` (table root), ``versionAsOf``, ``timestampAsOf``
    (mutually exclusive; default latest).

    FILTER PUSHDOWN is DEFAULT-ON (r14): registering the format flips
    ``spark.sql.python.filterPushdown.enabled`` for the session
    (``VersionedTableDataSource.name()`` runs driver-side during
    ``spark.dataSource.register``), and the reader() auto-probe then
    selects the ``_PushdownSnapshotReader`` subclass for plain
    ``.load().where(...)`` reads with zero options. This class is the
    conservative fallback — picked by ``.option("pushdown", "false")``
    (the opt-out) or when the session conf was forced back off (Spark
    4.1 RAISES for any reader that implements ``pushFilters`` while
    the conf is false, so the fallback must not implement it)."""

    def __init__(self, options, schema):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("versioned_table read requires a path")
        self.version = resolve_version(self.root, options)
        self.spark_schema = schema
        self.ranges: dict = {}

    def partitions(self):
        return plan_snapshot_partitions(
            self.root, self.version, self.ranges or None
        )

    def read(self, partition):
        yield from read_snapshot_partition(
            partition, self.spark_schema, self.ranges or None
        )


class _PushdownSnapshotReader(VersionedTableSnapshotReader):
    """FILTER PUSHDOWN face (Spark 4.1 ``pushFilters``; DEFAULT for
    registered-format reads since r14 — see
    ``VersionedTableSnapshotReader`` for the selection rules):
    comparison/
    equality/IN filters on top-level columns become per-column
    [lo, hi] bounds that (a) skip whole dirs/files at PLAN time
    against the manifest's dir/file stats and hive path values — the
    same data-skipping ``read_pruned`` does, now reached from plain
    ``.load().where(...)`` — and (b) push into the executor's Arrow
    scan for parquet row-group pruning. ALL filters are returned as
    residual, so Spark re-applies them and the skipping only ever
    needs to be conservative (strict bounds relaxed to inclusive,
    NULL-matching filters never pruned on)."""

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            attr = getattr(f, "attribute", None)
            if not attr or len(attr) != 1:
                continue  # nested / non-column filter: Spark-side only
            col = attr[0]
            lo = hi = None
            if isinstance(f, EqualTo):
                lo = hi = f.value
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                lo = f.value
            elif isinstance(f, (LessThan, LessThanOrEqual)):
                hi = f.value
            elif isinstance(f, In):
                vals = [v for v in f.values if v is not None]
                if not vals:
                    continue
                try:
                    lo, hi = min(vals), max(vals)
                except TypeError:
                    continue
            else:
                continue  # IsNull/Not/... : no min-max pruning
            if lo is None and hi is None:
                continue
            cur = self.ranges.get(col)
            if cur is None:
                self.ranges[col] = (lo, hi)
            else:  # conjunction: intersect the bounds
                clo, chi = cur
                try:
                    nlo = clo if lo is None else (
                        lo if clo is None else max(clo, lo)
                    )
                    nhi = chi if hi is None else (
                        hi if chi is None else min(chi, hi)
                    )
                    self.ranges[col] = (nlo, nhi)
                except TypeError:
                    pass
        return filters  # everything stays a residual: skip-only
