"""Versioned parquet table with atomic manifest commits — a minimal
lakehouse-style sink (Iceberg/Delta shape, zero external deps) so MERGE
and CDC compaction land somewhere durable.

Layout::

    <root>/
      data/commit-00000000-<uuid8>/  part-*.parquet  (one dir per commit)
      data/commit-00000001-<uuid8>/  ...
      _manifests/v00000000.json                (one manifest per version)
      _manifests/_latest                       (version CACHE, advisory)

A manifest lists the data DIRECTORIES visible in that version, so a
snapshot read is ``spark.read.parquet(*dirs)`` — parquet pushdown,
pruning, and partitioned layouts all still apply.

Commit protocol (safe under CONCURRENT writers):

* data dirs carry a per-attempt uuid suffix, so two in-flight writers
  can never write into (or orphan-clean) each other's directory;
* the manifest for version N is published with ``os.link(tmp, path)``
  — atomic fail-on-exists on POSIX — so exactly ONE writer wins each
  version and every loser gets ``CommitConflictError`` (the
  check-then-``os.rename`` it replaces would silently clobber the
  winner: rename replaces an existing destination);
* the true latest version is derived by LISTING ``_manifests/`` (the
  ``_latest`` file is only a cache, refreshed best-effort after each
  publish) — a crash between manifest publish and cache refresh
  self-heals on the next read instead of wedging the table;
* ``append``/``merge``/``delete_where``/``compact`` retry on conflict
  against a RE-READ snapshot (append re-lists the winner's dirs;
  the copy-on-write ops recompute from the new base), giving
  serializable last-writer-wins semantics with bounded retries.

Readers see either the old or the new version, never a half-commit.
Old versions stay readable (time travel) until ``vacuum``; data dirs
abandoned by a crashed or conflicted writer are unreachable (no
manifest references them) and are swept by ``vacuum`` too.

Operations:

* ``create`` / ``append`` — new commit dir + manifest (append lists old
  dirs + the new one). No data rewrite.
* ``merge`` — copy-on-write MERGE (upsert semantics via
  ``operators.upsert``): reads the current snapshot, merges the updates
  frame, writes a full new commit dir, manifest lists only that dir.
* ``delete_where`` — copy-on-write anti-filter rewrite.
* ``read`` — latest or ``version=`` snapshot.

At 100 TB the copy-on-write merge rewrites the table — that's the
simplest correct strategy (real Iceberg/Delta add file-level pruning &
merge-on-read); partition the table and merge per-partition slices to
bound rewrite cost. The commit protocol above is exactly the
Delta/Iceberg "optimistic concurrency + atomic metadata swap" shape,
restricted to a filesystem with atomic link (POSIX); on object stores
the link step maps to a conditional PUT.
"""

from __future__ import annotations

import json
import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifests"
_LATEST = "_latest"
_MANIFEST_RE = re.compile(r"v(\d{8})\.json$")
_DEFAULT_RETRIES = 3


class CommitConflictError(RuntimeError):
    """Another writer committed this version first. The losing
    attempt's data dir is unreachable (vacuum sweeps it); retry
    against a re-read snapshot or abort."""


class VersionedTable:
    def __init__(self, root: str, max_retries: int = _DEFAULT_RETRIES):
        self.root = root
        self._mdir = os.path.join(root, _MANIFEST_DIR)
        self.max_retries = max_retries

    # ------------------------------ internals -----------------------------
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._mdir, f"v{version:08d}.json")

    def _atomic_write(self, path: str, payload: str) -> None:
        """Replace-on-exists atomic write — for the _latest CACHE only
        (losing a race here is harmless: readers re-derive from the
        manifest listing)."""
        tmp = f"{path}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, path)

    def _publish(self, path: str, payload: str) -> None:
        """Atomic FAIL-on-exists publish for manifests: os.link raises
        FileExistsError if the destination exists (atomic on POSIX),
        so concurrent writers of the same version get exactly one
        winner — unlike os.rename, which silently replaces."""
        tmp = f"{path}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)
        except FileExistsError:
            raise CommitConflictError(
                f"version already committed by a concurrent writer: {path}"
            ) from None
        finally:
            os.unlink(tmp)
        # durability: fsync the directory so the link survives a crash
        dfd = os.open(self._mdir, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

    def _commit(
        self,
        dirs: list[str],
        op: str,
        version: int,
        meta: dict | None = None,
    ) -> int:
        import time

        manifest = {
            "version": version,
            "op": op,
            "data_dirs": dirs,
            # wall-clock commit stamp: powers read_as_of time travel.
            # Taken immediately before the atomic publish; monotone per
            # table even with concurrent writers, because the committer
            # of version N+1 re-reads the manifest of N (published
            # after N's stamp) before stamping its own.
            "committed_at": time.time(),
        }
        if meta:
            manifest["meta"] = meta
        os.makedirs(self._mdir, exist_ok=True)
        self._publish(
            self._manifest_path(version), json.dumps(manifest, indent=1)
        )
        # best-effort cache refresh; never regress it (a slow writer of
        # an older version must not roll the hint backwards)
        try:
            cached = self._cached_latest()
            if cached is None or cached < version:
                self._atomic_write(
                    os.path.join(self._mdir, _LATEST), str(version)
                )
        except OSError:
            pass  # cache only — latest_version() re-derives from listing
        return version

    def _read_manifest(self, version: int | None = None) -> dict:
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        with open(self._manifest_path(v)) as f:
            return json.load(f)

    def _write_data(
        self,
        df: DataFrame,
        version: int,
        partition_by: list[str] | None = None,
    ) -> str:
        # uuid suffix: each ATTEMPT owns a fresh directory, so a
        # concurrent writer can neither collide with it nor mistake it
        # for its own orphan. Dirs abandoned by a crash or a lost
        # commit race stay unreachable until vacuum.
        out = os.path.join(
            self.root,
            "data",
            f"commit-{version:08d}-{uuid.uuid4().hex[:8]}",
        )
        w = df.write.mode("errorifexists")
        if partition_by:
            # hive-partitioned commit dirs: snapshot reads get partition
            # pruning on these columns for free (the 100 TB layout —
            # e.g. partition the nightly increment by ingest date and a
            # date predicate never opens old files)
            w = w.partitionBy(*partition_by)
        w.parquet(out)
        return out

    # ------------------------------- public --------------------------------
    def exists(self) -> bool:
        return self.latest_version() is not None

    def _cached_latest(self) -> int | None:
        try:
            with open(os.path.join(self._mdir, _LATEST)) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def latest_version(self) -> int | None:
        """Highest committed version, derived from the manifest LISTING
        (source of truth — manifests appear atomically via link). The
        ``_latest`` file is only a cache: a writer that crashed between
        manifest publish and cache refresh, or a stale cache left by a
        concurrent writer, self-heals here instead of wedging the
        table (next version would be recomputed too low and every
        commit would conflict forever)."""
        try:
            names = os.listdir(self._mdir)
        except FileNotFoundError:
            return None
        best = None
        for n in names:
            m = _MANIFEST_RE.fullmatch(n)
            if m:
                v = int(m.group(1))
                if best is None or v > best:
                    best = v
        return best

    def history(self) -> list[dict]:
        v = self.latest_version()
        if v is None:
            return []
        return [self._read_manifest(i) for i in range(v + 1)]

    def meta(self, version: int | None = None) -> dict:
        """Caller-attached metadata of a committed version (e.g. the
        incremental-extract watermark) — rides in the manifest, so it
        became visible in the SAME atomic publish as the data."""
        if not self.exists():
            return {}
        return self._read_manifest(version).get("meta", {})

    def create(
        self,
        df: DataFrame,
        meta: dict | None = None,
        partition_by: list[str] | None = None,
    ) -> int:
        if self.exists():
            raise RuntimeError(f"table already exists at {self.root}")
        d = self._write_data(df, 0, partition_by)
        m = dict(meta or {})
        if partition_by:
            m["partition_by"] = list(partition_by)
        try:
            return self._commit([d], "create", 0, m or None)
        except CommitConflictError:
            # two concurrent creates: exactly one table exists, the
            # loser surfaces the same error a sequential second create
            # would have seen
            raise RuntimeError(
                f"table already exists at {self.root} "
                f"(lost create race to a concurrent writer)"
            ) from None

    def partition_columns(self) -> list[str]:
        """Partition layout recorded at create time (sticky: appends
        reuse it so every commit dir shares one hive layout)."""
        if not self.exists():
            return []
        return self._read_manifest(0).get("meta", {}).get("partition_by", [])

    def append(
        self,
        df: DataFrame,
        meta: dict | None = None,
        allow_evolution: bool = False,
    ) -> int:
        cur = self._read_manifest()
        # schema guard: an append with drifted columns would poison the
        # snapshot read (parquet union mismatch) — fail at commit time
        # with names, not at some later read with a cast error.
        # allow_evolution=True opts into additive drift instead: the
        # batch is written as-is and snapshot reads switch to
        # mergeSchema, so old rows surface the new columns as NULL
        # (the unionByName(allowMissingColumns) lakehouse semantics).
        have = set(
            df.sparkSession.read.parquet(cur["data_dirs"][-1]).columns
        )
        got = set(df.columns)
        m = dict(meta or {})
        if got != have:
            if not allow_evolution:
                raise ValueError(
                    f"append schema drift: table has {sorted(have)}, "
                    f"batch has {sorted(got)} "
                    f"(missing {sorted(have - got)}, extra {sorted(got - have)}) "
                    f"— pass allow_evolution=True for additive evolution"
                )
            m["schema_evolved"] = True
        # the batch's data dir is written ONCE; only the manifest is
        # retried. An append does not depend on the base's CONTENT,
        # just its dir list, so a conflict retry re-reads the winner's
        # manifest and re-lists — no data rewrite.
        d = self._write_data(
            df, cur["version"] + 1, self.partition_columns() or None
        )
        for attempt in range(self.max_retries + 1):
            v = cur["version"] + 1
            try:
                return self._commit(
                    cur["data_dirs"] + [d], "append", v, m or None
                )
            except CommitConflictError:
                if attempt == self.max_retries:
                    raise
                cur = self._read_manifest()

    def merge(
        self,
        updates: DataFrame,
        keys: list[str],
        version_col: str | None = None,
        meta: dict | None = None,
    ) -> int:
        """Copy-on-write MERGE: update rows win on key collision, new
        keys are inserted (upsert semantics; ``version_col`` breaks ties
        inside a non-key-unique updates batch). On commit conflict the
        merge is RECOMPUTED against the winner's snapshot (unlike
        append, the output depends on the base's content), so
        concurrent merges serialize."""
        from python_etl_spark.operators.upsert import upsert

        spark = updates.sparkSession
        for attempt in range(self.max_retries + 1):
            cur = self._read_manifest()
            base = self.read(spark, cur["version"])
            merged = upsert(
                base, updates.select(*base.columns), keys, version_col
            )
            v = cur["version"] + 1
            d = self._write_data(merged, v, self.partition_columns() or None)
            try:
                return self._commit([d], "merge", v, meta)
            except CommitConflictError:
                if attempt == self.max_retries:
                    raise

    def compact(self, spark: SparkSession | None = None) -> int:
        """Rewrite the current snapshot into ONE commit dir (keeping
        the hive layout). A long-lived incremental table accretes one
        dir per nightly append, and the snapshot read unions one scan
        per dir — fine for tens, an analysis-time liability at
        thousands. Periodic compaction (exactly Iceberg/Delta rewrite)
        resets that to a single scan; the bookmark metadata of the
        latest version is carried forward so incremental loads are
        unaffected. Conflict retry recomputes from the new snapshot
        (the interleaved commit's rows must not be lost)."""
        spark = spark or SparkSession.getActiveSession()
        for attempt in range(self.max_retries + 1):
            cur = self._read_manifest()
            base = self.read(spark, cur["version"])
            v = cur["version"] + 1
            d = self._write_data(base, v, self.partition_columns() or None)
            try:
                return self._commit([d], "compact", v, cur.get("meta"))
            except CommitConflictError:
                if attempt == self.max_retries:
                    raise

    def compact_if_needed(
        self, spark: SparkSession | None = None, max_dirs: int = 16
    ) -> int | None:
        """Compact only when the current snapshot unions more than
        ``max_dirs`` commit dirs — the maintenance hook a nightly
        incremental pipeline calls unconditionally after its append:
        cheap no-op most nights, one rewrite when the union-scan cost
        has actually accreted. Returns the new version, or None if no
        compaction ran."""
        cur = self._read_manifest()
        if len(cur["data_dirs"]) <= max_dirs:
            return None
        return self.compact(spark)

    def delete_where(self, condition) -> int:
        """Copy-on-write DELETE: rewrite the snapshot without matching
        rows. ``condition`` is a Column predicate. Conflict retry
        recomputes against the winner's snapshot."""
        spark = SparkSession.getActiveSession()
        for attempt in range(self.max_retries + 1):
            cur = self._read_manifest()
            base = self.read(spark, cur["version"])
            v = cur["version"] + 1
            d = self._write_data(
                base.where(~condition), v, self.partition_columns() or None
            )
            try:
                return self._commit([d], "delete", v)
            except CommitConflictError:
                if attempt == self.max_retries:
                    raise

    def read_as_of(self, spark: SparkSession, ts: float) -> DataFrame:
        """Time travel by wall clock: the snapshot of the LAST version
        committed at or before ``ts`` (epoch seconds). Commit stamps
        are monotone (each committer re-reads its predecessor before
        stamping), so this is a reverse scan over the manifest
        history."""
        v = self.latest_version()
        if v is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        for i in range(v, -1, -1):
            if self._read_manifest(i).get("committed_at", 0.0) <= ts:
                return self.read(spark, i)
        raise LookupError(
            f"no version committed at or before {ts} (earliest is "
            f"{self._read_manifest(0).get('committed_at')})"
        )

    def _schema_evolved(self, upto: int) -> bool:
        return any(
            self._read_manifest(i).get("meta", {}).get("schema_evolved")
            for i in range(upto + 1)
        )

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        m = self._read_manifest(version)
        dirs = m["data_dirs"]
        reader = spark.read
        if self._schema_evolved(m["version"]):
            # additive evolution happened somewhere in this snapshot's
            # history: merge footer schemas so pre-evolution files
            # surface the new columns as NULL
            reader = reader.option("mergeSchema", "true")
        if len(dirs) == 1 or not self.partition_columns():
            return reader.parquet(*dirs)
        # hive-partitioned commit dirs are separate partition roots —
        # Spark refuses one multi-path read (CONFLICTING_DIRECTORY_
        # STRUCTURES), so union per-dir scans; a partition predicate
        # still pushes into EVERY branch (pruning preserved)
        allow_missing = self._schema_evolved(m["version"])
        out = reader.parquet(dirs[0])
        for d in dirs[1:]:
            out = out.unionByName(
                reader.parquet(d), allowMissingColumns=allow_missing
            )
        return out

    def vacuum(self, grace_seconds: float = 0.0) -> list[str]:
        """Drop data dirs unreachable from the LATEST version: ends
        time travel for older versions and sweeps dirs abandoned by
        crashed or commit-losing writers. Returns removed dirs.

        ``grace_seconds`` is the in-flight-writer guard (the Delta
        VACUUM retention idea): dirs modified within the window are
        kept even if unreachable, because an active writer's
        not-yet-committed dir is indistinguishable from an orphan.
        Default 0 keeps the historical offline-maintenance semantics;
        pass e.g. 3600 when vacuuming a table other jobs may be
        writing."""
        import shutil
        import time

        live = set(self._read_manifest()["data_dirs"])
        data_root = os.path.join(self.root, "data")
        cutoff = time.time() - grace_seconds
        removed = []
        for name in sorted(os.listdir(data_root)):
            full = os.path.join(data_root, name)
            if full in live:
                continue
            if grace_seconds > 0 and os.path.getmtime(full) > cutoff:
                continue  # possibly an in-flight writer's dir
            shutil.rmtree(full)
            removed.append(full)
        return removed
