"""Compliance operators: right-to-be-forgotten cascade.

``forget_keys`` removes every row belonging to a tombstoned key across
a set of tables — the GDPR/CCPA deletion shape — and returns both the
cleaned frames and an audit frame (rows dropped / remaining per table),
because a deletion run that cannot attest what it deleted is not a
deletion run.

Scale posture: each table is flagged with ONE left join against the
tombstone set; the cleaned frame (filter hit=false) and the audit
aggregate both derive from that single persisted flagged frame, so the
table is scanned once and the two outputs cannot disagree about which
rows were dropped — the property a deletion-attestation artifact must
have. The tombstone side is usually tiny relative to the facts (it is
NOT hinted broadcast here — AQE broadcasts it when small, and a
mass-deletion backlog of 10^8 keys degrades to a shuffle join instead
of a driver OOM).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ForgetResult:
    """(cleaned, audit) pair that still owns its persisted parents.

    Unpacks like the historical 2-tuple (``cleaned, audit = ...``),
    and exposes ``release()`` to unpersist the per-table flagged
    caches once both outputs are consumed — without it, repeated
    deletion runs in one session would accumulate MEMORY_AND_DISK
    cache indefinitely (the parents are internal, so callers could
    not unpersist them by hand)."""

    def __init__(self, cleaned, audit, parents):
        self.cleaned = cleaned
        self.audit = audit
        self._parents = parents

    def __iter__(self):
        return iter((self.cleaned, self.audit))

    def release(self, blocking: bool = False) -> None:
        for p in self._parents:
            p.unpersist(blocking=blocking)


def forget_keys(
    tables: dict[str, tuple[DataFrame, str]],
    tombstones: DataFrame,
    tombstone_col: str | None = None,
) -> ForgetResult:
    """Apply a deletion list across tables.

    ``tables`` maps table name -> (frame, key column); ``tombstones``
    is a one-column frame of keys to forget (or pass ``tombstone_col``
    to pick one). Returns a ``ForgetResult`` — unpacks as (cleaned
    frames by name, audit frame with columns table/rows_before/
    rows_dropped/rows_after), and ``release()`` drops the internal
    caches when done.

    Both outputs for a table are views over one persisted flagged
    frame: whichever is evaluated first materializes the cache, and
    the other reads the same snapshot — a concurrently-mutating
    source cannot make the audit attest counts the cleaned frame
    didn't see. The caches are MEMORY_AND_DISK (spill-safe)."""
    tcol = tombstone_col or tombstones.columns[0]
    clash = {"__forget", "__hit"}.intersection(
        c for _, (df, _) in tables.items() for c in df.columns
    )
    if clash:
        # the marker columns would silently collide (drop/filter the
        # user's column instead of ours) — fail loudly with names
        raise ValueError(
            f"forget_keys reserves column names {sorted(clash)}; "
            f"rename them in the input tables"
        )
    tomb = tombstones.select(F.col(tcol).alias("__forget")).distinct()

    cleaned: dict[str, DataFrame] = {}
    audits = []
    parents = []
    for name, (df, key) in tables.items():
        flagged = (
            df.join(tomb, df[key] == tomb["__forget"], "left")
            .withColumn("__hit", F.col("__forget").isNotNull())
            .drop("__forget")
            .persist()
        )
        parents.append(flagged)
        cleaned[name] = flagged.where(~F.col("__hit")).drop("__hit")
        audits.append(
            flagged.agg(
                F.lit(name).alias("table"),
                F.count(F.lit(1)).alias("rows_before"),
                F.sum(F.when(F.col("__hit"), 1).otherwise(0))
                .cast("long")
                .alias("rows_dropped"),
                F.sum(F.when(F.col("__hit"), 0).otherwise(1))
                .cast("long")
                .alias("rows_after"),
            )
        )
    audit = audits[0]
    for a in audits[1:]:
        audit = audit.unionByName(a)
    return ForgetResult(cleaned, audit, parents)


def forget_across(
    tables: dict,
    tombstones: DataFrame,
    journal_path: str,
    merge_on_read: bool = False,
) -> list[dict]:
    """Right-to-be-forgotten CASCADE over :class:`VersionedTable`s
    with a COORDINATOR JOURNAL (r12 verdict #8): ``tables`` maps
    table name -> (VersionedTable, key column); every row whose key
    appears in ``tombstones`` (one-column frame) is deleted from
    every table via :meth:`delete_keys` — the distributed semi/anti
    join path, never a driver-collected IN list.

    CONSISTENCY CONTRACT — resumable, not atomic: each table's
    delete is its own atomic manifest commit, so a crash mid-cascade
    leaves some tables cleaned and others not. The journal at
    ``journal_path`` (atomic-replace JSON, the manifest pattern)
    records per-table completion WITH the committed version; re-
    running the SAME cascade (same journal path) skips completed
    tables and finishes the rest. A crash in the window between a
    table's commit and its journal mark re-runs that one delete,
    which is IDEMPOTENT (the keys are already gone — the retry
    commits a no-op version). The journal's terminal state is
    ``complete`` with every table's version — the attestation an
    auditor reads. Readers of a partially-forgotten set see each
    table's committed snapshot (never a torn table); the journal is
    what tells you whether the CASCADE finished.

    Returns the per-table report: [{table, status(deleted|skipped),
    version}] in execution order (deterministic: sorted by name).

    Scale posture: one semi-join probe + O(touched dirs) rewrite per
    table (or a tombstone sidecar with merge_on_read); the journal
    is O(#tables) metadata."""

    def _load() -> dict:
        try:
            with open(journal_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"state": "pending", "tables": {}}

    def _store(doc: dict) -> None:
        os.makedirs(os.path.dirname(journal_path) or ".", exist_ok=True)
        tmp = f"{journal_path}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, journal_path)

    doc = _load()
    known = set(doc["tables"])
    asked = set(tables)
    if known and not known <= asked:
        raise ValueError(
            f"journal {journal_path} belongs to a cascade over "
            f"{sorted(known)} — resuming with a DIFFERENT table set "
            f"{sorted(asked)} would attest completion for tables this "
            f"run never cleaned"
        )
    if doc["state"] == "pending":
        doc["tables"] = {
            n: doc["tables"].get(n, {"status": "pending"}) for n in tables
        }
        doc["state"] = "running"
        _store(doc)
    report = []
    for name in sorted(tables):
        t, key = tables[name]
        if doc["tables"].get(name, {}).get("status") == "done":
            report.append(
                {
                    "table": name,
                    "status": "skipped",
                    "version": doc["tables"][name].get("version"),
                }
            )
            continue
        keyed = tombstones.select(
            F.col(tombstones.columns[0]).alias(key)
        )
        v = t.delete_keys(keyed, merge_on_read=merge_on_read)
        doc["tables"][name] = {"status": "done", "version": v}
        _store(doc)
        report.append({"table": name, "status": "deleted", "version": v})
    if all(
        rec.get("status") == "done" for rec in doc["tables"].values()
    ):
        doc["state"] = "complete"
        _store(doc)
    return report
