"""Avro object-container-file connector — stdlib only, distributed.

No spark-avro jar ships in this environment, so this module implements
the public Avro 1.x container spec directly (magic ``Obj\\x01``, file
metadata map, sync-marker-delimited blocks, zigzag-varint primitives,
``null``/``deflate`` codecs):

* ``read_avro``  — ``binaryFile`` source -> ``mapInPandas`` decode: one
  task per file, scales with the file count like any Spark file source.
  The Avro writer schema is read from the FIRST file's header on the
  driver (header bytes only, never data) to type the Spark plan.
* ``write_avro`` — one ``.avro`` container file per partition, encoded
  executor-side inside ``mapInPandas`` (each task writes its own file
  and emits a manifest row), mirroring Spark's per-partition file
  layout. Works against any executor-visible filesystem path.

Supported schema subset: records of primitives (``null boolean int
long float double bytes string``), nullable unions ``["null", T]``,
and arrays of primitives (e.g. embedding columns). Nested records,
maps, enums and fixed raise a clear error.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

_MAGIC = b"Obj\x01"

# ----------------------------- primitive codec -----------------------------


def _zigzag_encode(n: int) -> bytes:
    n = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: memoryview, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _read_bytes(buf: memoryview, pos: int) -> tuple[bytes, int]:
    n, pos = _zigzag_decode(buf, pos)
    return bytes(buf[pos : pos + n]), pos + n


def _write_bytes(out: bytearray, b: bytes) -> None:
    out += _zigzag_encode(len(b))
    out += b


# ----------------------------- schema mapping ------------------------------

_PRIMS = {
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "bytes": "binary",
    "string": "string",
}


def _field_types(avro_schema: dict) -> list[tuple[str, object]]:
    """[(name, type)] where type is a prim name, ('null', prim) for a
    nullable union, or ('array', prim)."""
    if avro_schema.get("type") != "record":
        raise ValueError(f"top-level Avro type must be record, got {avro_schema}")
    out: list[tuple[str, object]] = []
    for f in avro_schema["fields"]:
        t = f["type"]
        if isinstance(t, dict) and t.get("type") == "array":
            item = t["items"]
            if item not in _PRIMS:
                raise ValueError(f"unsupported Avro array items {item!r}")
            out.append((f["name"], ("array", item)))
        elif isinstance(t, list):
            nn = [x for x in t if x != "null"]
            if len(t) != 2 or "null" not in t or nn[0] not in _PRIMS:
                raise ValueError(f"unsupported Avro union {t!r}")
            out.append((f["name"], ("null", nn[0])))
        elif t in _PRIMS:
            out.append((f["name"], t))
        else:
            raise ValueError(f"unsupported Avro type {t!r} for field {f['name']}")
    return out


def _spark_ddl(fields: list[tuple[str, object]]) -> str:
    parts = []
    for name, t in fields:
        if isinstance(t, tuple) and t[0] == "array":
            parts.append(f"{name} array<{_PRIMS[t[1]]}>")
        elif isinstance(t, tuple):
            parts.append(f"{name} {_PRIMS[t[1]]}")
        else:
            parts.append(f"{name} {_PRIMS[t]}")
    return ", ".join(parts)


# ------------------------------- decoding ---------------------------------


def _decode_value(buf: memoryview, pos: int, t: object):
    if isinstance(t, tuple) and t[0] == "null":
        idx, pos = _zigzag_decode(buf, pos)
        if idx == 0:
            return None, pos
        return _decode_value(buf, pos, t[1])
    if isinstance(t, tuple) and t[0] == "array":
        items = []
        while True:
            n, pos = _zigzag_decode(buf, pos)
            if n == 0:
                break
            if n < 0:  # block-size prefix variant
                _, pos = _zigzag_decode(buf, pos)
                n = -n
            for _ in range(n):
                v, pos = _decode_value(buf, pos, t[1])
                items.append(v)
        return items, pos
    if t == "boolean":
        return buf[pos] == 1, pos + 1
    if t in ("int", "long"):
        return _zigzag_decode(buf, pos)
    if t == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t == "bytes":
        return _read_bytes(buf, pos)
    if t == "string":
        b, pos = _read_bytes(buf, pos)
        return b.decode("utf-8"), pos
    raise ValueError(f"unsupported Avro type {t!r}")


def _parse_header(buf: memoryview) -> tuple[dict, str, bytes, int]:
    """-> (schema dict, codec, sync marker, position after header)."""
    if bytes(buf[:4]) != _MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _zigzag_decode(buf, pos)
        if n == 0:
            break
        if n < 0:
            _, pos = _zigzag_decode(buf, pos)
            n = -n
        for _ in range(n):
            k, pos = _read_bytes(buf, pos)
            v, pos = _read_bytes(buf, pos)
            meta[k.decode()] = v
    sync = bytes(buf[pos : pos + 16])
    pos += 16
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    return schema, codec, sync, pos


def _decode_container(data: bytes) -> tuple[dict, list[dict]]:
    buf = memoryview(data)
    schema, codec, sync, pos = _parse_header(buf)
    fields = _field_types(schema)
    rows: list[dict] = []
    while pos < len(buf):
        count, pos = _zigzag_decode(buf, pos)
        size, pos = _zigzag_decode(buf, pos)
        block = bytes(buf[pos : pos + size])
        pos += size
        if bytes(buf[pos : pos + 16]) != sync:
            raise ValueError("Avro block sync marker mismatch (corrupt file)")
        pos += 16
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported Avro codec {codec!r}")
        bb = memoryview(block)
        bpos = 0
        for _ in range(count):
            row = {}
            for name, t in fields:
                row[name], bpos = _decode_value(bb, bpos, t)
            rows.append(row)
    return schema, rows


# ------------------------------- encoding ---------------------------------


def _encode_value(out: bytearray, v, t: object) -> None:
    if isinstance(t, tuple) and t[0] == "null":
        # pandas surfaces SQL NULL as None or float NaN
        if v is None or (isinstance(v, float) and v != v):
            out += _zigzag_encode(0)
            return
        out += _zigzag_encode(1)
        _encode_value(out, v, t[1])
        return
    if isinstance(t, tuple) and t[0] == "array":
        if v is None:
            v = []
        if len(v):
            out += _zigzag_encode(len(v))
            for item in v:
                _encode_value(out, item, t[1])
        out += _zigzag_encode(0)
        return
    if t == "boolean":
        out.append(1 if v else 0)
    elif t in ("int", "long"):
        out += _zigzag_encode(int(v))
    elif t == "float":
        out += struct.pack("<f", float(v))
    elif t == "double":
        out += struct.pack("<d", float(v))
    elif t == "bytes":
        _write_bytes(out, bytes(v))
    elif t == "string":
        _write_bytes(out, str(v).encode("utf-8"))
    else:
        raise ValueError(f"unsupported Avro type {t!r}")


_SPARK_TO_AVRO = {
    "boolean": "boolean",
    "integer": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "binary": "bytes",
    "string": "string",
}


def _avro_schema_for(df: DataFrame, name: str = "row") -> dict:
    fields = []
    for f in df.schema.fields:
        tn = f.dataType.typeName()
        if tn == "array":
            item = f.dataType.elementType.typeName()  # type: ignore[attr-defined]
            if item not in _SPARK_TO_AVRO:
                raise ValueError(f"unsupported array element type {item}")
            at: object = {"type": "array", "items": _SPARK_TO_AVRO[item]}
        elif tn in _SPARK_TO_AVRO:
            at = (
                ["null", _SPARK_TO_AVRO[tn]] if f.nullable else _SPARK_TO_AVRO[tn]
            )
        else:
            raise ValueError(
                f"unsupported Spark type {tn} for Avro field {f.name} "
                "(cast timestamps/decimals to string/long first)"
            )
        fields.append({"name": f.name, "type": at})
    return {"type": "record", "name": name, "fields": fields}


def _encode_container(
    rows: list[dict], schema: dict, codec: str = "deflate", sync: bytes = b"\x00" * 16
) -> bytes:
    fields = _field_types(schema)
    out = io.BytesIO()
    out.write(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    head = bytearray()
    head += _zigzag_encode(len(meta))
    for k, v in meta.items():
        _write_bytes(head, k.encode())
        _write_bytes(head, v)
    head += _zigzag_encode(0)
    out.write(bytes(head))
    out.write(sync)
    if rows:
        body = bytearray()
        for row in rows:
            for name, t in fields:
                _encode_value(body, row.get(name), t)
        block = bytes(body)
        if codec == "deflate":
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            block = c.compress(block) + c.flush()
        out.write(_zigzag_encode(len(rows)))
        out.write(_zigzag_encode(len(block)))
        out.write(block)
        out.write(sync)
    return out.getvalue()


# ------------------------------ public API ---------------------------------


def read_avro(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """Read ``.avro`` container files distributed (one task per file).

    If a spark-avro jar happens to be on the classpath it is used
    directly; otherwise the stdlib decoder runs inside mapInPandas.
    ``schema`` (Spark DDL) skips the driver-side header peek — pass it
    when the path is only executor-visible."""
    try:
        return spark.read.format("avro").load(path)
    except Exception:  # noqa: BLE001 — no jar: stdlib path below
        pass

    import pandas as pd

    if schema is None:
        first = _first_avro_file(path)
        with open(first, "rb") as fh:
            head = fh.read(65536)
        avro_schema, _, _, _ = _parse_header(memoryview(head))
        fields = _field_types(avro_schema)
        schema = _spark_ddl(fields)
    field_names = [s.strip().split(" ", 1)[0] for s in schema.split(",")]

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(path)
        .select("content")
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            for content in batch["content"]:
                _, rows = _decode_container(bytes(content))
                yield pd.DataFrame(rows, columns=field_names)

    return files.mapInPandas(_decode, schema=schema)


def _first_avro_file(path: str) -> str:
    if os.path.isfile(path):
        return path
    names = sorted(n for n in os.listdir(path) if n.endswith(".avro"))
    if not names:
        raise FileNotFoundError(f"no .avro files under {path}")
    return os.path.join(path, names[0])


def write_avro(
    df: DataFrame, path: str, mode: str = "overwrite", codec: str = "deflate"
) -> str:
    """Write one Avro container file per partition, executor-side.

    Returns the directory path. The per-task encode runs inside
    mapInPandas and emits a (file, rows) manifest row per partition, so
    the write parallelism equals the input partitioning — same layout
    contract as Spark's native file sinks."""
    try:
        df.write.mode(mode).format("avro").save(path)
        return path
    except Exception:  # noqa: BLE001 — no jar: stdlib path below
        pass

    import pandas as pd
    from pyspark.sql import functions as F

    schema = _avro_schema_for(df)
    if mode == "overwrite" and os.path.isdir(path):
        for n in os.listdir(path):
            if n.endswith(".avro"):
                os.remove(os.path.join(path, n))
    os.makedirs(path, exist_ok=True)
    cols = [f.name for f in df.schema.fields]

    with_pid = df.withColumn("__pid", F.spark_partition_id())

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: list[dict] = []
        pid = None
        for batch in batches:
            if len(batch) and pid is None:
                pid = int(batch["__pid"].iloc[0])
            for rec in batch[cols].to_dict("records"):
                rows.append(
                    {
                        k: (v.tolist() if hasattr(v, "tolist") else v)
                        for k, v in rec.items()
                    }
                )
        if pid is None:
            yield pd.DataFrame({"file": [], "rows": []})
            return
        data = _encode_container(rows, schema, codec)
        fname = os.path.join(path, f"part-{pid:05d}.avro")
        with open(fname, "wb") as fh:
            fh.write(data)
        yield pd.DataFrame({"file": [fname], "rows": [len(rows)]})

    manifest = with_pid.mapInPandas(_write, schema="file string, rows long")
    manifest.collect()  # materialize the write
    return path
