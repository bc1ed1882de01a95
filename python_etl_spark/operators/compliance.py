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
