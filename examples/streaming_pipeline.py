#!/usr/bin/env python
"""End-to-end streaming pipeline on the events table:

file-source stream (at-least-once: input is deliberately doubled) ->
watermark-bounded exact dedup -> hourly windowed aggregation ->
foreachBatch MERGE into the versioned lakehouse sink -> final snapshot
verified against the batch twin computed from the SAME helpers.

Every stage is the same function the batch engine uses
(streaming/dedup.py, streaming/windows.py, operators/upsert.py), which
is the repo's core streaming contract: one definition, two runtimes.

Run: python examples/streaming_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from python_etl_spark import get_spark  # noqa: E402
from python_etl_spark.sinks.table import VersionedTable  # noqa: E402
from python_etl_spark.sources.tables import load_table  # noqa: E402
from python_etl_spark.streaming.dedup import dedup_events  # noqa: E402
from python_etl_spark.streaming.windows import hourly_event_stats  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = tempfile.mkdtemp("stream-pipeline")
    spark = get_spark("streaming-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    # stage the stream input: every event delivered TWICE (at-least-once)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
    )
    src = f"{work}/in"
    ev.unionAll(ev).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    deduped = dedup_events(stream, key_cols=["event_id"], watermark="2 hours")
    hourly = hourly_event_stats(deduped)  # watermark already set by dedup_events

    table = VersionedTable(f"{work}/hourly_stats")

    def merge_batch(batch_df, batch_id: int) -> None:
        # idempotent MERGE: replaying a micro-batch converges
        if table.exists():
            table.merge(batch_df, keys=["window_start", "event_type"])
        else:
            table.create(batch_df)

    q = (
        hourly.writeStream.foreachBatch(merge_batch)
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{work}/ckpt")
        .start()
    )
    q.awaitTermination(300)

    got = table.read(spark)
    truth = hourly_event_stats(dedup_events(ev, key_cols=["event_id"]))
    n_got, n_truth = got.count(), truth.count()
    joined = got.join(
        truth,
        ["window_start", "event_type", "n", "total_value"],
        "inner",
    ).count()
    print(
        f"stream_rows={ev.count() * 2} deduped_windows={n_got} "
        f"batch_windows={n_truth} matching={joined} "
        f"versions={len(table.history())} "
        f"exact_match={n_got == n_truth == joined}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
