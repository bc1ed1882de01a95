"""Message-bus streaming sources.

``read_stream_kafka`` completes the source matrix with the connector a
production deployment would actually run. No Kafka broker or connector
jar exists in this sandbox, so the function is GATED the same way as
JDBC/Excel: the API and option wiring are real, and a descriptive
RuntimeError explains exactly what to provision — this is the honest
scope (same pattern as sources/readers.read_jdbc).

``parse_kafka_records`` is the half that IS fully testable offline: it
takes any frame with the Kafka wire schema (key/value binary, topic,
partition, offset, timestamp) — streaming or batch — and turns the
JSON payloads into typed columns, so the full
bus → parse → dedup → window → sink pipeline is unit-tested end-to-end
against the built-in rate source standing in for the broker.

Scale posture: a Kafka scan parallelizes per topic-partition;
``minPartitions`` can split further. Parsing is a pure projection
(from_json, zero shuffle); everything downstream is the same plan the
file source runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_stream_kafka(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
    **options,
) -> DataFrame:
    """Kafka streaming source returning the standard wire schema
    (key, value, topic, partition, offset, timestamp, ...).

    Gated: raises a descriptive error when the Kafka connector jar
    (org.apache.spark:spark-sql-kafka-0-10_2.13) is not on the
    classpath — it is not bundled in this environment."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:  # noqa: BLE001
        raise RuntimeError(
            "Kafka streaming read failed — the Kafka connector is not "
            "bundled in this environment. Add "
            "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> "
            "to spark.jars.packages and point kafka.bootstrap.servers "
            f"at a reachable broker. Underlying error: {e}"
        ) from e


def read_stream_rate(
    spark: SparkSession,
    rows_per_second: int = 100,
    num_partitions: int | None = None,
) -> DataFrame:
    """Built-in rate source — the broker stand-in for tests and local
    smoke runs: (timestamp, value) rows at a fixed rate, supports
    availableNow. Always present; no gate needed."""
    reader = spark.readStream.format("rate").option(
        "rowsPerSecond", str(rows_per_second)
    )
    if num_partitions:
        reader = reader.option("numPartitions", str(num_partitions))
    return reader.load()


def parse_kafka_records(
    raw: DataFrame, payload_schema: str, ts_from_payload: str | None = None
) -> DataFrame:
    """Kafka wire records -> typed event rows.

    ``raw`` must carry the Kafka source schema (binary ``value`` plus
    topic/partition/offset/timestamp); works identically on a
    streaming frame from read_stream_kafka and on a batch frame built
    in a test. JSON payloads are parsed with ``from_json`` against
    ``payload_schema``; rows whose payload fails to parse are KEPT
    with null fields (dead-letter them downstream with a null filter
    — silently dropping poison records loses data). ``ts_from_payload``
    names a payload column to surface as the event-time ``ts`` (falls
    back to the broker timestamp), ready for withWatermark."""
    parsed = raw.select(
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.col("timestamp").alias("broker_ts"),
        F.from_json(F.col("value").cast("string"), payload_schema).alias("p"),
    )
    if ts_from_payload:
        # the payload field must already BE a timestamp: coalescing a
        # string/long against the broker timestamp would coerce both
        # sides and silently emit a non-timestamp `ts`, breaking the
        # advertised withWatermark readiness downstream
        from pyspark.sql.types import TimestampType

        ptype = dict(
            (f.name, f.dataType)
            for f in parsed.schema["p"].dataType.fields
        ).get(ts_from_payload)
        if not isinstance(ptype, TimestampType):
            raise TypeError(
                f"ts_from_payload column {ts_from_payload!r} is "
                f"{ptype} — declare it TIMESTAMP in payload_schema "
                f"(e.g. 'ts TIMESTAMP'), or convert epoch fields with "
                f"timestamp_seconds/millis before watermarking"
            )
        ts = F.coalesce(F.col(f"p.{ts_from_payload}"), F.col("broker_ts"))
    else:
        ts = F.col("broker_ts")
    fields = parsed.schema["p"].dataType.names
    payload_cols = [
        F.col(f"p.{f}") for f in fields if f != ts_from_payload
    ]
    return parsed.select(
        "topic", "partition", "offset", "broker_ts",
        ts.alias("ts"), *payload_cols,
    )
