"""Incremental (cross-snapshot) dedup: new batches against the
accepted corpus, without rescanning the corpus text.

Every dedup op in operators/dedup.py dedups one corpus against
itself. Production training-data pipelines ingest BATCHES (a nightly
crawl slice) and must drop documents already accepted in ANY earlier
batch — rescanning 100 TB of accepted text per night is not an
option. The standard design, composed here from pieces this repo
already has:

* a persisted SIGNATURE STORE — a :class:`VersionedTable`
  (sinks/table.py) holding ``(sig, doc id, batch id)`` rows, KBs per
  million docs, never the text;
* new batch -> compute signatures -> keep-first WITHIN the batch ->
  ANTI-JOIN against the store (signature-only scan; at cluster scale
  bucket the store by ``sig`` so the join is exchange-free on the
  store side) -> the survivors are the accepted rows;
* append the survivors' signatures to the store in ONE atomic
  versioned commit stamped with the batch id (the bookmark pattern of
  ``etl_incremental_load``).

Crash contract (the two-phase gap): the store append is the atomic
commit point.

* Crash BEFORE the append: the store is unchanged; re-running the
  batch recomputes the identical accepted set (pure function of
  batch + store) and appends once. Nothing lost, nothing doubled.
* Crash AFTER the append (caller lost the output): re-running with
  the same ``batch_id`` still returns the same accepted rows —
  the anti-join EXCLUDES store rows carrying this batch id, so the
  batch's own signatures don't mark it as duplicate — and the
  append is skipped (the store already has a commit for this batch
  id). Idempotent at-least-once driver semantics, exactly-once
  store effects.

CONCURRENCY: store commits ride the VersionedTable race protocol —
two writers appending different batches at once both land (the loser
retries onto the winner's snapshot; no lost commits, pytest-raced).
Admission DECISIONS, however, serialize only as far as the caller
orders them: two batches accepted concurrently each filtered against
a snapshot that predates the other, so a text novel to both is
accepted by both. Run accept_batch sequentially per corpus (the
nightly pattern); concurrent ingestion wants a post-hoc sweep
(dedup_exact over the union) or per-batch-id partitioned admission.

Replay ORDERING caveat: re-running batch N after batches N+1.. have
committed is stable — accepted signature sets are DISJOINT across
batches (a later batch only ever accepted signatures absent from
batch N's commit), so excluding batch N's own rows and anti-joining
the rest reproduces batch N's original decision. What is NOT
supported is replaying batch N with DIFFERENT contents under the same
batch id: the store won't re-append (the id is already committed), so
novel documents in the revised batch would pass the filter but never
register. Give revised batches a new id.

:class:`IncrementalDeduper` stores exact signatures (md5 of
optionally-normalized text); :class:`IncrementalMinHashDeduper` is
the NEAR-dup variant — its store holds MinHash BAND keys (``bands``
rows per accepted doc) and a batch doc is dropped when it shares any
(band, bucket) with the accepted corpus, the same LSH collision rule
``dedup_minhash_lsh`` uses for its candidate pairs. The
store/commit/idempotency machinery is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_etl_spark.sinks.table import CommitConflictError, VersionedTable


def text_signature(text_col, normalized: bool = True):
    """md5 signature column; ``normalized`` folds case and collapses
    whitespace runs first (the dedup_exact_normalized convention)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    if normalized:
        c = F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))
    return F.md5(c)


def _migrate_legacy_id(table: VersionedTable, spark, new_rows: DataFrame) -> None:
    """One-time store migration (ADVICE r9): stores created before
    native-typed provenance ids persisted ``id`` as BIGINT (string ids
    were cast to NULL long). A post-upgrade batch with string ids
    would append a string ``id`` into the same table and the next
    snapshot read would die on the long-vs-string conflict. Mirror of
    MaterializedRollup's rebuild-once guard: when the incoming ``id``
    is a string and the store's is not, rewrite the store ONCE with
    ``id`` cast to string (legacy NULLs stay NULL — their provenance
    was already lost at the original cast; dedup keys on sig/bucket,
    never on id). Numeric-vs-numeric drift is left to append's type
    widening; incompatible drift still fails loudly there."""
    from pyspark.sql.types import StringType

    store = table.read(spark)
    old_t = store.schema["id"].dataType
    new_t = new_rows.schema["id"].dataType
    if old_t == new_t or not isinstance(new_t, StringType):
        return
    table.overwrite(
        store.withColumn("id", F.col("id").cast("string")),
        meta={"id_type_migrated": "string"},
    )


class IncrementalDeduper:
    """Signature store + batch filter. One instance per logical corpus."""

    def __init__(
        self,
        root: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        normalized: bool = True,
    ):
        self.table = VersionedTable(root)
        self.id_col = id_col
        self.text_col = text_col
        self.normalized = normalized

    def _sigs(self, batch: DataFrame) -> DataFrame:
        return batch.withColumn(
            "__sig", text_signature(self.text_col, self.normalized)
        )

    def _store(self, spark) -> DataFrame | None:
        if not self.table.exists():
            return None
        return self.table.read(spark)

    def batch_committed(self, spark, batch_id: str) -> bool:
        """Has this batch id already been appended? (Signature-only
        parquet scan with a pushed-down equality filter.)"""
        store = self._store(spark)
        if store is None:
            return False
        return (
            store.where(F.col("batch_id") == batch_id).limit(1).count() > 0
        )

    def accept_batch(self, batch: DataFrame, batch_id: str) -> DataFrame:
        """Filter ``batch`` against the store and commit the survivors'
        signatures. Returns the accepted rows (original columns).

        Deterministic: within-batch keep-first is ordered by the id
        column; the cross-snapshot filter is an anti-join on ``sig``
        against every PRIOR batch's signatures. The returned frame is
        computed before the append and re-derivable after a crash —
        see the module docstring for the exact crash contract."""
        spark = batch.sparkSession
        sigs = self._sigs(batch)
        # keep-first within the batch (dedup_exact shape: one window
        # over the signature key, never all-pairs)
        from pyspark.sql import Window

        w = Window.partitionBy("__sig").orderBy(F.col(self.id_col))
        first = sigs.withColumn("__rn", F.row_number().over(w)).where(
            F.col("__rn") == 1
        )
        store = self._store(spark)
        if store is not None:
            prior = store.where(F.col("batch_id") != batch_id).select(
                F.col("sig").alias("__sig")
            )
            first = first.join(prior, "__sig", "left_anti")
        accepted = first.drop("__rn")

        # store the id in its NATIVE type: URL/hash string ids are the
        # common corpus key, and casting them to long would silently
        # null the provenance column (dedup itself keys on sig only)
        new_sigs = accepted.select(
            F.col("__sig").alias("sig"),
            F.col(self.id_col).alias("id"),
            F.lit(batch_id).alias("batch_id"),
        )
        if store is None:
            self.table.create(new_sigs, meta={"batch_id": batch_id})
        elif not self.batch_committed(spark, batch_id):
            _migrate_legacy_id(self.table, spark, new_sigs)
            self.table.append(new_sigs, meta={"batch_id": batch_id})
            # nightly maintenance: a store accretes one commit dir per
            # batch; compact when the union-scan cost has actually
            # piled up (cheap no-op otherwise), manifests stay bounded
            # via the table's periodic checkpoints + clean_metadata
            self.table.compact_if_needed(spark)
        return accepted.drop("__sig")


class MaterializedRollup:
    """Incrementally-maintained aggregate (materialized view) over a
    :class:`VersionedTable` source — appends fold directly, and
    merge/delete commits fold through the table's row-level change
    feed (``row_changes``).

    The 100 TB shape: a nightly fact append is GBs while the fact table
    is the full corpus — so the refresh must aggregate ONLY the new
    rows and fold them into the existing rollup state, never rescan
    the corpus. Composition of pieces this repo already has:

    * ``VersionedTable.changes(since, to)`` — reads just the commit
      dirs the appends added (the incremental-read face);
    * mergeable partial aggregates (the ``etl_partial_agg_merge``
      algebra): sum-of-sums, count-as-sum, min-of-mins, max-of-maxs.
      Spec = ``{out_col: (fn, src_col)}`` with fn in sum/count/min/max
      (avg = maintain sum + count, divide at read time — avg is not
      mergeable by itself);
    * one atomic ``overwrite`` commit of the merged state CARRYING the
      source bookmark (``meta={"source_version": v}``) — state and
      bookmark can never disagree.

    Crash contract (same shape as the dedupers): the overwrite is the
    commit point. Crash before it → rollup unchanged, bookmark
    unchanged, replay refolds the identical delta. Crash after it →
    bookmark already advanced, replay sees ``source_version >= target``
    and no-ops. Exactly-once rollup effects under at-least-once
    driving.

    SOURCE REWRITES no longer force a re-baseline: the refresh picks a
    fold strategy from the range's commit ops (metadata only, via
    ``VersionedTable.ops_in_range``):

    * appends / compactions only → classic mergeable fold (all fns);
    * merge/delete in range, spec all sum/count → SIGNED fold over the
      typed ``row_changes`` feed (+insert/+update_postimage,
      -update_preimage/-delete) — the counting algorithm from
      incremental view maintenance; reads ONLY the commits' cdf/append
      files, never the corpus. State carries a hidden per-key live-row
      counter (``__rows``) so keys whose rows all die are dropped
      exactly like a recompute would;
    * merge/delete in range with min/max in the spec → min/max is not
      subtractable, so recompute ONLY the affected keys (the feed's
      key set) against the source snapshot — a key-pruned semi join,
      not a corpus rescan when the source layout prunes on the keys.

    An ``overwrite`` source commit (no row lineage) still raises via
    ``row_changes``; re-baseline with :meth:`rebuild`. Pre-CDF state
    tables (no ``__rows`` column) are rebuilt once on first refresh.

    The rollup table itself is small (aggregate cardinality), so
    copy-on-write overwrite per refresh is the right cost; for a huge
    rollup, partition it and overwrite only changed partitions.
    """

    _MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    _ROWS = "__rows"

    def __init__(
        self,
        root: str,
        keys: list[str],
        spec: dict,
        target_files: int = 1,
    ):
        """``target_files`` bounds the file count of each committed
        state (default 1: a rollup is aggregate-cardinality, and a
        32-shuffle-partition write of a 35-row frame is 32 tiny
        files per refresh); raise it for a genuinely huge rollup."""
        for out, (fn, _src) in spec.items():
            if fn not in ("sum", "count", "min", "max"):
                raise ValueError(
                    f"{out}: '{fn}' is not a mergeable aggregate "
                    f"(sum/count/min/max; build avg from sum+count)"
                )
        self.table = VersionedTable(root)
        self.keys = list(keys)
        self.spec = dict(spec)
        self.target_files = target_files

    def _pack(self, state: DataFrame) -> DataFrame:
        return state.coalesce(self.target_files)

    def _partial(self, delta: DataFrame) -> DataFrame:
        aggs = []
        for out, (fn, src) in self.spec.items():
            col = (
                F.count(src) if fn == "count" else self._MERGE[fn](src)
            ).alias(out)
            aggs.append(col)
        aggs.append(F.count(F.lit(1)).alias(self._ROWS))
        return delta.groupBy(*self.keys).agg(*aggs)

    def _signed_partial(self, feed: DataFrame) -> DataFrame:
        """Per-key SIGNED delta from a typed change feed — valid only
        for an all-sum/count spec (min/max can't be subtracted)."""
        w = (
            F.when(
                F.col("_change_type").isin("insert", "update_postimage"),
                F.lit(1),
            )
            .otherwise(F.lit(-1))
            .cast("long")
        )
        aggs = []
        for out, (fn, src) in self.spec.items():
            if fn == "sum":
                aggs.append(F.sum(F.col(src) * w).alias(out))
            else:  # count: signed count of non-nulls
                aggs.append(
                    F.sum(
                        F.when(F.col(src).isNotNull(), w).otherwise(
                            F.lit(0)
                        )
                    ).alias(out)
                )
        aggs.append(F.sum(w).alias(self._ROWS))
        return feed.groupBy(*self.keys).agg(*aggs)

    def _merge(self, state: DataFrame, partial: DataFrame) -> DataFrame:
        unioned = state.unionByName(partial)
        aggs = [
            self._MERGE[fn](out).alias(out)
            for out, (fn, _src) in self.spec.items()
        ]
        aggs.append(F.sum(self._ROWS).alias(self._ROWS))
        merged = unioned.groupBy(*self.keys).agg(*aggs)
        # a key whose live rows all died folds to __rows == 0: drop it,
        # matching what a recompute (groupBy over surviving rows) sees
        return merged.where(F.col(self._ROWS) != 0)

    def source_version(self) -> int | None:
        """Bookmark: the source version the current state reflects."""
        if not self.table.exists():
            return None
        return self.table.meta().get("source_version")

    def read(self, spark) -> DataFrame:
        state = self.table.read(spark)
        if self._ROWS in state.columns:
            state = state.drop(self._ROWS)
        return state

    def _state(self, spark) -> DataFrame:
        return self.table.read(spark)

    def _next_state(
        self, source: VersionedTable, spark, done: int, target: int
    ) -> DataFrame:
        ops = set(source.ops_in_range(done, target))
        if ops <= {"append", "compact", "compact_bins"}:
            # pure inserts: classic mergeable fold (all agg fns)
            feed = source.row_changes(spark, done, target).drop(
                "_change_type", "_commit_version"
            )
            return self._merge(self._state(spark), self._partial(feed))
        fns = {fn for fn, _src in self.spec.values()}
        if fns <= {"sum", "count"}:
            # updates/deletes, subtractable spec: signed fold — reads
            # only the range's cdf/append files
            feed = source.row_changes(spark, done, target)
            return self._merge(
                self._state(spark), self._signed_partial(feed)
            )
        # min/max in spec: recompute ONLY the keys the feed touched
        feed = source.row_changes(spark, done, target)
        aff = feed.select(*self.keys).distinct()
        kept = self._state(spark).join(aff, self.keys, "left_anti")
        rec = self._partial(
            source.read(spark, target).join(aff, self.keys, "left_semi")
        )
        return kept.unionByName(rec)

    def refresh(self, source: VersionedTable, spark) -> int | None:
        """Fold source commits since the bookmark into the rollup.
        Returns the new rollup version, or None when already current
        (the idempotent-replay path). Conflict retries recompute from
        the winner's snapshot (read-modify-write)."""
        target = source.latest_version()
        if target is None:
            return None
        if not self.table.exists():
            state = self._pack(self._partial(source.read(spark, target)))
            self.table.create(state, meta={"source_version": target})
            return self.table.latest_version()
        for _ in range(self.table.max_retries + 1):
            done = self.source_version()
            if done is None:  # state exists but carries no bookmark
                return self.rebuild(source, spark)
            if done >= target:
                return None
            if self._ROWS not in self.table.read(spark).columns:
                # pre-CDF state (no live-row counter): rebuild once
                return self.rebuild(source, spark)
            state = self._pack(self._next_state(source, spark, done, target))
            try:
                return self.table.overwrite(
                    state,
                    meta={"source_version": target},
                    retry_conflict=False,
                )
            except CommitConflictError:
                continue
        raise CommitConflictError(
            f"rollup refresh lost {self.table.max_retries + 1} races"
        )

    def rebuild(self, source: VersionedTable, spark) -> int:
        """Full recompute (the re-baseline after a source rewrite)."""
        target = source.latest_version()
        state = self._pack(self._partial(source.read(spark, target)))
        if not self.table.exists():
            self.table.create(state, meta={"source_version": target})
            return self.table.latest_version()
        return self.table.overwrite(
            state, meta={"source_version": target}
        )


class IncrementalMinHashDeduper:
    """Cross-snapshot NEAR-dup: MinHash band store + batch filter.

    Store schema: ``(band, bucket, id, batch_id)`` — ``bands`` rows
    per accepted doc (~16 x 16 B), never text or shingles. Filter
    semantics, in order:

    1. CROSS-BATCH: drop a batch doc sharing ANY (band, bucket) with a
       PRIOR batch's accepted rows — the LSH collision rule, applied
       against the store via one semi join on the band key (bucketed
       store ⇒ exchange-free at cluster scale).
    2. WITHIN-BATCH: among the survivors, keep a doc only if it is the
       MIN id of every bucket it occupies. Kept docs therefore share
       no bucket (pairwise non-candidates), and each dropped doc
       shares a bucket with a smaller-id doc in its near-dup chain —
       the greedy cluster-collapse rule, deterministic without an
       iterative connected-components pass (use ``dedup_groups`` when
       exact cluster minima matter).

    Crash contract identical to :class:`IncrementalDeduper`: the band
    append is the atomic commit point, re-runs of a committed
    ``batch_id`` return the same accepted rows and skip the append.
    """

    def __init__(
        self,
        root: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        num_hashes: int = 64,
        bands: int = 16,
        k: int = 3,
    ):
        self.table = VersionedTable(root)
        self.id_col = id_col
        self.text_col = text_col
        self.num_hashes = num_hashes
        self.bands = bands
        self.k = k

    def batch_committed(self, spark, batch_id: str) -> bool:
        if not self.table.exists():
            return False
        return (
            self.table.read(spark)
            .where(F.col("batch_id") == batch_id)
            .limit(1)
            .count()
            > 0
        )

    def accept_batch(self, batch: DataFrame, batch_id: str) -> DataFrame:
        from python_etl_spark.operators.dedup import (
            band_buckets,
            minhash_signatures,
        )

        spark = batch.sparkSession
        sigs = minhash_signatures(
            batch, self.text_col, self.id_col, self.num_hashes, self.k
        )
        bb = band_buckets(sigs, self.num_hashes, self.bands)
        if self.table.exists():
            prior = self.table.read(spark).where(
                F.col("batch_id") != batch_id
            )
            hit = (
                bb.join(
                    prior.select("band", "bucket"), ["band", "bucket"],
                    "left_semi",
                )
                .select("id")
                .distinct()
            )
            bb = bb.join(hit, "id", "left_anti")
        # within-batch: survivors are min of EVERY bucket they occupy
        minb = bb.groupBy("band", "bucket").agg(F.min("id").alias("min_id"))
        dropped = (
            bb.join(minb, ["band", "bucket"])
            .where(F.col("id") > F.col("min_id"))
            .select("id")
            .distinct()
        )
        kept_bb = bb.join(dropped, "id", "left_anti")
        kept_ids = kept_bb.select("id").distinct()
        accepted = batch.join(
            kept_ids.withColumnRenamed("id", self.id_col), self.id_col
        )
        # native-typed id, same rationale as IncrementalDeduper: never
        # null a string doc id by casting it to long
        new_rows = kept_bb.select(
            "band",
            "bucket",
            F.col("id"),
            F.lit(batch_id).alias("batch_id"),
        )
        if not self.table.exists():
            self.table.create(new_rows, meta={"batch_id": batch_id})
        elif not self.batch_committed(spark, batch_id):
            _migrate_legacy_id(self.table, spark, new_rows)
            self.table.append(new_rows, meta={"batch_id": batch_id})
            self.table.compact_if_needed(spark)
        return accepted


class MaterializedTopK:
    """Incrementally-maintained per-key TOP-K (a leaderboard) over a
    :class:`VersionedTable` source — the second maintained view shape
    next to :class:`MaterializedRollup`. Appends fold because top-k is
    MERGEABLE state (top-k(top-k(A) ∪ B) = top-k(A ∪ B)): each refresh
    ranks only current state ∪ the new commit's rows, never the
    corpus. Source merge/delete commits can EVICT rows that folded
    state cannot resurrect, so those refreshes recompute just the keys
    the ``row_changes`` feed touched (key-pruned semi join against the
    snapshot); an ``overwrite`` source commit still requires a
    re-baseline (the feed raises).

    Determinism: rows rank by (order_col DESC, tiebreak ASC); pass a
    unique ``tiebreak`` column so state is replay-stable. Crash /
    replay / conflict contract identical to the rollup (atomic
    overwrite carrying the source bookmark)."""

    def __init__(
        self,
        root: str,
        keys: list[str],
        order_col: str,
        tiebreak: str,
        k: int = 10,
    ):
        self.table = VersionedTable(root)
        self.keys = list(keys)
        self.order_col = order_col
        self.tiebreak = tiebreak
        self.k = k

    def _topk(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        w = Window.partitionBy(*self.keys).orderBy(
            F.desc(self.order_col), F.asc(self.tiebreak)
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= self.k)
            .drop("__rn")
            .coalesce(1)
        )

    def source_version(self) -> int | None:
        if not self.table.exists():
            return None
        return self.table.meta().get("source_version")

    def read(self, spark) -> DataFrame:
        return self.table.read(spark)

    def refresh(self, source: VersionedTable, spark) -> int | None:
        """Fold source appends since the bookmark. None = already
        current (idempotent replay); conflicts recompute from the
        winner's snapshot."""
        target = source.latest_version()
        if target is None:
            return None
        if not self.table.exists():
            state = self._topk(source.read(spark, target))
            self.table.create(state, meta={"source_version": target})
            return self.table.latest_version()
        for _ in range(self.table.max_retries + 1):
            done = self.source_version()
            if done is None:
                state = self._topk(source.read(spark, target))
                return self.table.overwrite(
                    state, meta={"source_version": target}
                )
            if done >= target:
                return None
            ops = set(source.ops_in_range(done, target))
            if ops <= {"append", "compact", "compact_bins"}:
                # pure inserts: top-k state is mergeable
                delta = source.row_changes(spark, done, target).drop(
                    "_change_type", "_commit_version"
                )
                state = self._topk(self.read(spark).unionByName(delta))
            else:
                # updates/deletes: an evicted row can't be resurrected
                # from top-k state, so recompute ONLY the keys the
                # feed touched (key-pruned semi join, never the
                # corpus); untouched keys keep their folded state
                feed = source.row_changes(spark, done, target)
                aff = feed.select(*self.keys).distinct()
                kept = self.read(spark).join(aff, self.keys, "left_anti")
                rec = self._topk(
                    source.read(spark, target).join(
                        aff, self.keys, "left_semi"
                    )
                )
                state = kept.unionByName(rec).coalesce(1)
            try:
                return self.table.overwrite(
                    state,
                    meta={"source_version": target},
                    retry_conflict=False,
                )
            except CommitConflictError:
                continue
        raise CommitConflictError(
            f"top-k refresh lost {self.table.max_retries + 1} races"
        )


class MaterializedThetaSketch:
    """Incrementally-maintained THETA/KMV distinct-membership sketch
    per audience over a :class:`VersionedTable` source — the third
    maintained-view shape (next to the rollup and the top-k), powering
    audience size / union / intersection / difference estimates
    without ever rescanning the corpus.

    Mergeability is EXACT, not approximate: the K smallest member
    hashes of (A ∪ B) are the K smallest of (KMV_K(A) ∪ KMV_K(B)), so
    folding each append's delta into the stored sketch reproduces the
    batch-built sketch BIT-FOR-BIT (pytest-pinned) — the incremental
    path changes cost, never answers. Hashing matches
    ``events_audience_theta`` (40-bit md5-derived), so stored sketches
    compose with the query's pairwise set algebra.

    Source merge/delete commits can remove members, and a removal may
    UNHIDE a hash the saturated sketch discarded — not foldable; those
    refreshes recompute ONLY the audiences the ``row_changes`` feed
    touched (audience-pruned semi join), untouched audiences keep
    their folded state. ``overwrite`` still re-baselines via
    :meth:`rebuild`. Crash / replay / conflict contract identical to
    the rollup (one atomic overwrite carrying the source bookmark).

    The 100 TB shape: a nightly refresh hashes ONLY the appended rows
    (one distinct shuffle over the delta) and re-ranks K x |audiences|
    stored rows — state is ~KB however large the corpus."""

    def __init__(
        self,
        root: str,
        audience_col: str,
        member_col: str,
        k: int = 128,
    ):
        self.table = VersionedTable(root)
        self.audience_col = audience_col
        self.member_col = member_col
        self.k = k

    _R = 1 << 40  # 10 md5 hex digits, matching events_audience_theta

    def _hashed(self, df: DataFrame) -> DataFrame:
        h = F.conv(
            F.substring(
                F.md5(F.col(self.member_col).cast("string")), 1, 10
            ),
            16,
            10,
        ).cast("long")
        return df.select(
            F.col(self.audience_col).alias("aud"), h.alias("h")
        )

    def _sketch(self, hashed: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        w = Window.partitionBy("aud").orderBy("h")
        return (
            hashed.distinct()
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= self.k)
            .drop("__rn")
            .coalesce(1)
        )

    def source_version(self) -> int | None:
        if not self.table.exists():
            return None
        return self.table.meta().get("source_version")

    def read(self, spark) -> DataFrame:
        return self.table.read(spark)

    def estimates(self, spark) -> DataFrame:
        """Per-audience distinct-member estimate from the stored
        sketch: exact below K members, retained * R / theta above
        (integer division — replayable cross-engine)."""
        sk = self.read(spark)
        st = sk.groupBy("aud").agg(
            F.count(F.lit(1)).alias("nk"), F.max("h").alias("hmax")
        ).withColumn(
            "theta",
            F.when(F.col("nk") >= self.k, F.col("hmax")).otherwise(
                F.lit(self._R)
            ),
        )
        return (
            sk.join(F.broadcast(st), "aud")
            .where(F.col("h") < F.col("theta"))
            .groupBy("aud", "theta")
            .agg(F.count(F.lit(1)).alias("ret"))
            .select(
                "aud",
                F.expr(f"(ret * {self._R}) div theta").alias("est"),
            )
        )

    def refresh(self, source: VersionedTable, spark) -> int | None:
        """Fold source commits since the bookmark. None = already
        current (idempotent replay); conflicts recompute from the
        winner's snapshot."""
        target = source.latest_version()
        if target is None:
            return None
        if not self.table.exists():
            state = self._sketch(
                self._hashed(source.read(spark, target))
            )
            self.table.create(state, meta={"source_version": target})
            return self.table.latest_version()
        for _ in range(self.table.max_retries + 1):
            done = self.source_version()
            if done is None:
                return self.rebuild(source, spark)
            if done >= target:
                return None
            ops = set(source.ops_in_range(done, target))
            if ops <= {"append", "compact", "compact_bins"}:
                delta = source.row_changes(spark, done, target).drop(
                    "_change_type", "_commit_version"
                )
                state = self._sketch(
                    self.read(spark).unionByName(self._hashed(delta))
                )
            else:
                # member removals can unhide discarded hashes:
                # recompute only the audiences the feed touched
                feed = source.row_changes(spark, done, target)
                aff = (
                    feed.select(
                        F.col(self.audience_col).alias("aud")
                    ).distinct()
                )
                kept = self.read(spark).join(aff, "aud", "left_anti")
                rec = self._sketch(
                    self._hashed(
                        source.read(spark, target).join(
                            aff.select(
                                F.col("aud").alias(self.audience_col)
                            ),
                            self.audience_col,
                            "left_semi",
                        )
                    )
                )
                state = kept.unionByName(rec).coalesce(1)
            try:
                return self.table.overwrite(
                    state,
                    meta={"source_version": target},
                    retry_conflict=False,
                )
            except CommitConflictError:
                continue
        raise CommitConflictError(
            f"sketch refresh lost {self.table.max_retries + 1} races"
        )

    def rebuild(self, source: VersionedTable, spark) -> int:
        """Full recompute (the re-baseline after a source rewrite)."""
        target = source.latest_version()
        state = self._sketch(self._hashed(source.read(spark, target)))
        return self.table.overwrite(
            state, meta={"source_version": target}
        )
