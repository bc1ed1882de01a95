"""Keyed upsert / merge (the *load-with-updates* half of ETL).

``upsert`` merges an updates frame into a base frame by key: the
update row wins where keys collide, base rows pass through otherwise.
Implemented as union + windowed keep-first — one shuffle on the key,
no driver-side state, works at any scale. ``latest_by_key`` is the
same machinery for change-log compaction (keep the newest version of
each key, e.g. CDC streams)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    version_col: str | None = None,
) -> DataFrame:
    """updates override base on key collisions; schemas must match.

    Without ``version_col``: update rows win unconditionally (classic
    MERGE). With ``version_col``: the HIGHEST version wins regardless
    of side, updates winning version ties — so a stale or replayed
    update can never regress a newer base row. That makes a CDC MERGE
    both idempotent (replaying a batch is a no-op once a newer version
    landed) and batch-order-robust (out-of-order micro-batches
    converge to the true latest state). ``updates`` should be
    key-unique; with several rows per key, ``version_col`` makes the
    survivor deterministic.

    NULL-version semantics: ordering is ``desc`` with Spark's default
    NULLS LAST, so a NULL version sorts below every non-null version
    on either side — an update row with a missing version loses to any
    versioned base row (no version ⇒ cannot prove it is newer). Two
    NULL versions fall back to the update-wins tie-break. Changelogs
    where null-versioned updates must still win should
    ``coalesce(version, <max sentinel>)`` before calling."""
    tagged = updates.withColumn("__pri", F.lit(0)).unionByName(
        base.withColumn("__pri", F.lit(1))
    )
    order = (
        [F.desc(version_col), F.asc("__pri")] if version_col
        else [F.asc("__pri")]
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__pri", "__rn")
    )


def latest_by_key(
    df: DataFrame,
    keys: list[str],
    version_col: str,
    tiebreak: str | list[str] | None = None,
) -> DataFrame:
    """Change-log compaction: keep the highest-version row per key.

    Pass ``tiebreak`` column(s) that make the ordering total — without
    one, version ties are broken arbitrarily (nondeterministic across
    runs/partitionings)."""
    tiebreaks = (
        [tiebreak] if isinstance(tiebreak, str) else list(tiebreak or [])
    )
    order = [F.desc(version_col)] + [F.desc(t) for t in tiebreaks]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def conform_schema(df, target_ddl: str, strict: bool = False):
    """Conform a frame to a target schema: reorder, cast, and add
    missing columns as NULLs; drop extras unless ``strict`` (then
    raise). The standard last-step before a typed sink."""
    from pyspark.sql.types import StructType

    target = StructType.fromDDL(target_ddl)
    have = set(df.columns)
    extra = have - {f.name for f in target.fields}
    if strict and extra:
        raise ValueError(f"unexpected columns: {sorted(extra)}")
    cols = []
    for f in target.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
