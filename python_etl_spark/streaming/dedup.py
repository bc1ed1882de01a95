"""Streaming exact deduplication — one definition for batch and
streaming (the same contract as streaming/windows.py).

``dedup_events`` drops repeated deliveries of the same event key. On a
streaming frame it bounds state with a watermark +
``dropDuplicatesWithinWatermark`` (keys older than the horizon are
evicted from the state store, so at-least-once sources dedup in O(keys
within horizon) state, not O(all keys ever)); on a batch frame the same
call is a plain ``dropDuplicates`` — which is what makes the batch twin
(plans.training.stream_dedup_batch_equiv) hash-checkable against
DuckDB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_events(
    events: DataFrame,
    key_cols: Sequence[str] = ("user_id", "event_type", "ts"),
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Keep one row per event key.

    Streaming: duplicates arriving within ``watermark`` of the original
    are dropped; a duplicate arriving LATER than the horizon would be
    re-emitted (the price of bounded state — size the horizon to the
    source's redelivery window). Batch: exact global dedup. Pass only
    the key columns if non-key columns matter downstream — with full
    rows, which duplicate survives is nondeterministic in batch mode."""
    keys = list(key_cols)
    if events.isStreaming:
        return events.withWatermark(
            ts_col, watermark
        ).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)
