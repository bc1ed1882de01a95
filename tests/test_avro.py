"""Avro connector: stdlib container codec, distributed read/write.

Round-trips go through the real Spark write path (executor-side encode,
one file per partition) and the real read path (binaryFile +
mapInPandas decode), so the whole connector is exercised end to end
without a spark-avro jar.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from python_etl_spark.sources.avro import (
    _decode_container,
    _encode_container,
    read_avro,
    write_avro,
)

SCHEMA = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": ["null", "double"]},
        {"name": "ok", "type": "boolean"},
        {"name": "emb", "type": {"type": "array", "items": "double"}},
    ],
}

ROWS = [
    {"id": 1, "name": "alpha", "score": 1.5, "ok": True, "emb": [0.1, 0.2]},
    {"id": 2, "name": None, "score": None, "ok": False, "emb": []},
    {"id": -3, "name": "unicode é中", "score": -2.25, "ok": True,
     "emb": [3.0]},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_codec_roundtrip(codec):
    data = _encode_container(ROWS, SCHEMA, codec=codec)
    schema, rows = _decode_container(data)
    assert schema == SCHEMA
    assert rows == ROWS


def test_container_empty():
    data = _encode_container([], SCHEMA)
    _, rows = _decode_container(data)
    assert rows == []


def test_spark_write_read_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"doc {i}" if i % 3 else None, float(i) / 4, i % 2 == 0,
          [float(i), float(i + 1)])
         for i in range(100)],
        "id long, name string, score double, ok boolean, emb array<double>",
    ).repartition(4)
    out = str(tmp_path / "avro_out")
    write_avro(df, out)

    back = read_avro(spark, out)
    assert back.count() == 100
    got = {r["id"]: r for r in back.collect()}
    assert got[4]["name"] == "doc 4" and got[4]["emb"] == [4.0, 5.0]
    assert got[0]["name"] is None
    assert math.isclose(got[7]["score"], 1.75)
    # one container file per non-empty partition
    import os

    files = [n for n in os.listdir(out) if n.endswith(".avro")]
    assert len(files) == 4


def test_read_with_explicit_schema(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    out = str(tmp_path / "avro_schema")
    write_avro(df, out, codec="null")
    back = read_avro(spark, out, schema="id bigint, name string")
    assert sorted((r.id, r.name) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_unsupported_type_raises(spark):
    df = spark.range(1).select(F.current_timestamp().alias("ts"))
    with pytest.raises(ValueError, match="unsupported Spark type"):
        write_avro(df, "/tmp/nope")
