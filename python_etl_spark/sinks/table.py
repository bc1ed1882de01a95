"""Versioned parquet table with atomic manifest commits — a minimal
lakehouse-style sink (Iceberg/Delta shape, zero external deps) so MERGE
and CDC compaction land somewhere durable.

Layout::

    <root>/
      data/commit-00000000/   part-*.parquet   (one dir per commit)
      data/commit-00000001/   ...
      _manifests/v00000000.json                (one manifest per version)
      _manifests/_latest                       (current version number)

A manifest lists the data DIRECTORIES visible in that version, so a
snapshot read is ``spark.read.parquet(*dirs)`` — parquet pushdown,
pruning, and partitioned layouts all still apply. Commits are atomic:
the manifest is written to a temp name and ``os.rename``d into place
(atomic on POSIX), and ``_latest`` is swapped the same way; readers see
either the old or the new version, never a half-commit. Old versions
stay readable (time travel) until ``vacuum``.

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
bound rewrite cost.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifests"
_LATEST = "_latest"


class VersionedTable:
    def __init__(self, root: str):
        self.root = root
        self._mdir = os.path.join(root, _MANIFEST_DIR)

    # ------------------------------ internals -----------------------------
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._mdir, f"v{version:08d}.json")

    def _atomic_write(self, path: str, payload: str) -> None:
        tmp = f"{path}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, path)  # atomic on POSIX

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
            # Taken immediately before the atomic rename, so stamps are
            # monotone per table (single-writer, enforced by the
            # version-exists check below).
            "committed_at": time.time(),
        }
        if meta:
            manifest["meta"] = meta
        os.makedirs(self._mdir, exist_ok=True)
        path = self._manifest_path(version)
        if os.path.exists(path):
            raise RuntimeError(
                f"version {version} already committed (concurrent writer?)"
            )
        self._atomic_write(path, json.dumps(manifest, indent=1))
        self._atomic_write(os.path.join(self._mdir, _LATEST), str(version))
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
        out = os.path.join(self.root, "data", f"commit-{version:08d}")
        if os.path.exists(out) and not os.path.exists(
            self._manifest_path(version)
        ):
            # orphan from a writer that died between data write and
            # manifest commit — the version was never visible, so the
            # retry replaces it wholesale (crash-replay safety)
            import shutil

            shutil.rmtree(out)
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

    def latest_version(self) -> int | None:
        try:
            with open(os.path.join(self._mdir, _LATEST)) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def history(self) -> list[dict]:
        v = self.latest_version()
        if v is None:
            return []
        return [self._read_manifest(i) for i in range(v + 1)]

    def meta(self, version: int | None = None) -> dict:
        """Caller-attached metadata of a committed version (e.g. the
        incremental-extract watermark) — rides in the manifest, so it
        became visible in the SAME atomic rename as the data."""
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
        return self._commit([d], "create", 0, m or None)

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
        v = cur["version"] + 1
        d = self._write_data(df, v, self.partition_columns() or None)
        return self._commit(cur["data_dirs"] + [d], "append", v, m or None)

    def merge(
        self,
        updates: DataFrame,
        keys: list[str],
        version_col: str | None = None,
        meta: dict | None = None,
    ) -> int:
        """Copy-on-write MERGE: update rows win on key collision, new
        keys are inserted (upsert semantics; ``version_col`` breaks ties
        inside a non-key-unique updates batch)."""
        from python_etl_spark.operators.upsert import upsert

        cur = self._read_manifest()
        spark = updates.sparkSession
        base = self.read(spark, cur["version"])
        merged = upsert(base, updates.select(*base.columns), keys, version_col)
        v = cur["version"] + 1
        d = self._write_data(merged, v, self.partition_columns() or None)
        return self._commit([d], "merge", v, meta)

    def compact(self, spark: SparkSession | None = None) -> int:
        """Rewrite the current snapshot into ONE commit dir (keeping
        the hive layout). A long-lived incremental table accretes one
        dir per nightly append, and the snapshot read unions one scan
        per dir — fine for tens, an analysis-time liability at
        thousands. Periodic compaction (exactly Iceberg/Delta rewrite)
        resets that to a single scan; the bookmark metadata of the
        latest version is carried forward so incremental loads are
        unaffected."""
        cur = self._read_manifest()
        spark = spark or SparkSession.getActiveSession()
        base = self.read(spark, cur["version"])
        v = cur["version"] + 1
        d = self._write_data(base, v, self.partition_columns() or None)
        return self._commit([d], "compact", v, cur.get("meta"))

    def delete_where(self, condition) -> int:
        """Copy-on-write DELETE: rewrite the snapshot without matching
        rows. ``condition`` is a Column predicate."""
        cur = self._read_manifest()
        spark = SparkSession.getActiveSession()
        base = self.read(spark, cur["version"])
        v = cur["version"] + 1
        d = self._write_data(
            base.where(~condition), v, self.partition_columns() or None
        )
        return self._commit([d], "delete", v)

    def read_as_of(self, spark: SparkSession, ts: float) -> DataFrame:
        """Time travel by wall clock: the snapshot of the LAST version
        committed at or before ``ts`` (epoch seconds). Commit stamps
        are monotone (single-writer), so this is a reverse scan over
        the manifest history."""
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

    def vacuum(self) -> list[str]:
        """Drop data dirs unreachable from the LATEST version (ends time
        travel for older versions). Returns removed dirs."""
        import shutil

        live = set(self._read_manifest()["data_dirs"])
        data_root = os.path.join(self.root, "data")
        removed = []
        for name in sorted(os.listdir(data_root)):
            full = os.path.join(data_root, name)
            if full not in live:
                shutil.rmtree(full)
                removed.append(full)
        return removed
