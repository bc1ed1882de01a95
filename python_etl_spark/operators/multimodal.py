"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The Spark-side architecture is real and tested: binary columns, a
metadata struct, Arrow-batched ``mapInPandas`` decode with an explicit
output schema, and batch-shape control via
``spark.sql.execution.arrow.maxRecordsPerBatch``.

The actual media decoders (PIL / soundfile / ffmpeg) are NOT in this
container, so ``decode_media`` dispatches to a deterministic fake
decoder by default and raises ``NotImplementedError`` when a real
decode is requested — the seam where image/audio libs plug in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id bigint, fmt string, byte_len bigint, width int, height int"
)


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: utf-8 payload bytes + typed metadata."""
    fmt = F.element_at(
        F.array(F.lit("png"), F.lit("jpg"), F.lit("wav")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    meta = F.struct(
        fmt.alias("fmt"),
        F.length(F.col(text_col)).alias("declared_len"),
    )
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        meta.alias("meta"),
    )


def _fake_decode(batch: pd.DataFrame) -> pd.DataFrame:
    byte_len = batch["payload"].map(len)
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "fmt": batch["fmt"],
            "byte_len": byte_len,
            # deterministic fake dimensions derived from payload size —
            # stands in for a real header parse
            "width": (64 + byte_len % 512).astype("int32"),
            "height": (64 + byte_len % 256).astype("int32"),
        }
    )


def decode_media(
    payloads: DataFrame, real_decoder: bool = False
) -> DataFrame:
    """Arrow-batched decode over (doc_id, payload, meta) rows."""
    if real_decoder:
        raise NotImplementedError(
            "media decoders (PIL/soundfile) are not available in this "
            "environment; plug a real decoder into _decode_iter here"
        )
    flat = payloads.select("doc_id", "payload", F.col("meta.fmt").alias("fmt"))

    def _decode_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield _fake_decode(batch)

    return flat.mapInPandas(_decode_iter, schema=DECODE_SCHEMA)


def frame_sample(
    payloads: DataFrame, every_nth: int = 10, max_frames: int = 4
) -> DataFrame:
    """Video-style frame sampling stub: emits (doc_id, frame_no) rows for
    deterministic fake frame indices; a real implementation would demux
    the container inside the same mapInPandas body."""
    n_frames = F.least(
        F.lit(max_frames), (F.length("payload") / every_nth).cast("int") + 1
    )
    return payloads.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_no"),
    )
