"""Avro binary output encoding for envelope records — pure Python, spec
conformant, Arrow-batched.

The reference's largest integration-test family serializes the envelope
through the Kafka Connect Avro converter with Schema-Registry naming
(ScyllaTypesAllAvroConnectorIT; schema names namespaced per table,
ScyllaSchema.java:186-209).  Spark ships `to_avro`/`from_avro` in the
external spark-avro module, which is not on this container's classpath —
so this module implements the Avro 1.11 *binary encoding* spec directly
(https://avro.apache.org/docs/1.11.1/specification/): zigzag-varint
ints/longs, IEEE-LE floats, length-prefixed bytes/strings, block-coded
arrays/maps, index-prefixed unions, field-ordered records.  With the jar
present, `to_avro(col, json.dumps(avro_schema_of(dt)))` is a drop-in
replacement; byte-level golden vectors in tests/test_avro.py pin spec
conformance so the two encoders interoperate.

Encoding runs row-at-a-time *inside* Arrow batches (mapInPandas /
pandas_udf) — the per-row Python here is the serializer itself, not a
kernel a builtin could replace, and it sits on the OUTPUT edge after all
payload processing.
"""

from __future__ import annotations

import io
import os
import struct
from typing import Any

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# schema derivation: Spark StructType -> Avro schema (JSON-able dict)
# ---------------------------------------------------------------------------


def avro_schema_of(
    dt: T.DataType,
    *,
    name: str = "Value",
    namespace: str | None = None,
    nullable: bool = False,
    _path: str = "",
) -> Any:
    """Avro schema for a Spark type.  Nullable fields become the union
    ["null", T] (null first, matching the Connect converter).  Nested
    record names are derived from the field path and prefixed with
    `namespace` — the ScyllaSchema.java:186-209 Schema-Registry-unique
    naming discipline."""
    base: Any
    if isinstance(dt, T.StructType):
        rec_name = name if not _path else _path.replace(".", "_")
        base = {
            "type": "record",
            "name": rec_name,
            "fields": [
                {
                    "name": f.name,
                    "type": avro_schema_of(
                        f.dataType,
                        name=name,
                        nullable=f.nullable,
                        _path=(f"{_path}.{f.name}" if _path else f"{name}.{f.name}"),
                    ),
                }
                for f in dt.fields
            ],
        }
        if namespace and not _path:
            base["namespace"] = namespace
    elif isinstance(dt, T.ArrayType):
        base = {
            "type": "array",
            "items": avro_schema_of(
                dt.elementType,
                name=name,
                nullable=dt.containsNull,
                _path=f"{_path}.item" if _path else f"{name}.item",
            ),
        }
    elif isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, T.StringType):
            raise TypeError(
                "Avro maps need string keys; represent non-string-keyed "
                "maps as array<struct<key,value>> (the engine's CQL MAP "
                "translation already does, SURVEY §1.2)"
            )
        base = {
            "type": "map",
            "values": avro_schema_of(
                dt.valueType,
                name=name,
                nullable=dt.valueContainsNull,
                _path=f"{_path}.value" if _path else f"{name}.value",
            ),
        }
    elif isinstance(dt, T.StringType):
        base = "string"
    elif isinstance(dt, T.BinaryType):
        base = "bytes"
    elif isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
        base = "int"
    elif isinstance(dt, T.LongType):
        base = "long"
    elif isinstance(dt, T.FloatType):
        base = "float"
    elif isinstance(dt, T.DoubleType):
        base = "double"
    elif isinstance(dt, T.BooleanType):
        base = "boolean"
    elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        base = {"type": "long", "logicalType": "timestamp-micros"}
    elif isinstance(dt, T.DateType):
        base = {"type": "int", "logicalType": "date"}
    else:
        raise TypeError(f"no Avro mapping for Spark type {dt.simpleString()}")
    return ["null", base] if nullable else base


# ---------------------------------------------------------------------------
# binary encoder / decoder (Avro 1.11 spec)
# ---------------------------------------------------------------------------


def _write_long(buf: io.BytesIO, v: int) -> None:
    """Zigzag + base-128 varint (spec 'Primitive Types: int, long')."""
    z = (v << 1) ^ (v >> 63)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def _read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _ts_to_micros(v: Any) -> int:
    # pandas.Timestamp / datetime -> epoch micros
    import datetime as dt

    import pandas as pd

    if isinstance(v, pd.Timestamp):
        return v.value // 1_000
    if isinstance(v, dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=dt.timezone.utc)
        return int(v.timestamp() * 1_000_000)
    return int(v)


def _date_to_days(v: Any) -> int:
    import datetime as dt

    if isinstance(v, dt.date):
        return (v - dt.date(1970, 1, 1)).days
    return int(v)


def _is_null(v: Any) -> bool:
    """None, float NaN, or pandas NaT — the null spellings Arrow→pandas
    conversion produces for missing scalars."""
    if v is None:
        return True
    import numpy as np

    if isinstance(v, (float, np.floating)):
        return bool(v != v)
    import pandas as pd

    return v is pd.NaT


def encode_value(buf: io.BytesIO, schema: Any, v: Any) -> None:
    """Encode one value against an avro_schema_of-shaped schema node."""
    if isinstance(schema, list):  # union ["null", T]
        if _is_null(v):
            _write_long(buf, 0)
            return
        _write_long(buf, 1)
        encode_value(buf, schema[1], v)
        return
    if _is_null(v):
        # NaN/NaT from Arrow→pandas must error here, not stringify to
        # the literal "nan"/"NaT" downstream.
        raise ValueError(f"null for non-nullable Avro schema {schema!r}")
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "record":
        for f in schema["fields"]:
            encode_value(buf, f["type"], _field(v, f["name"]))
    elif t == "array":
        items = list(v)
        if items:
            _write_long(buf, len(items))
            for it in items:
                encode_value(buf, schema["items"], it)
        _write_long(buf, 0)
    elif t == "map":
        entries = list(v.items()) if isinstance(v, dict) else list(v)
        if entries:
            _write_long(buf, len(entries))
            for k, val in entries:
                _write_long(buf, len(k.encode("utf-8")))
                buf.write(k.encode("utf-8"))
                encode_value(buf, schema["values"], val)
        _write_long(buf, 0)
    elif t == "string":
        raw = str(v).encode("utf-8")
        _write_long(buf, len(raw))
        buf.write(raw)
    elif t == "bytes":
        raw = bytes(v)
        _write_long(buf, len(raw))
        buf.write(raw)
    elif t == "int":
        lt = schema.get("logicalType") if isinstance(schema, dict) else None
        _write_long(buf, _date_to_days(v) if lt == "date" else int(v))
    elif t == "long":
        lt = schema.get("logicalType") if isinstance(schema, dict) else None
        _write_long(buf, _ts_to_micros(v) if lt == "timestamp-micros" else int(v))
    elif t == "float":
        buf.write(struct.pack("<f", float(v)))
    elif t == "double":
        buf.write(struct.pack("<d", float(v)))
    elif t == "boolean":
        buf.write(b"\x01" if v else b"\x00")
    else:
        raise TypeError(f"unsupported Avro type {t!r}")


def decode_value(buf: io.BytesIO, schema: Any) -> Any:
    """Decode one value; records come back as dicts, timestamps as epoch
    micros ints, dates as epoch days ints (logical-type raw values)."""
    if isinstance(schema, list):
        return None if _read_long(buf) == 0 else decode_value(buf, schema[1])
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "record":
        return {f["name"]: decode_value(buf, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                n = -n
                _read_long(buf)
            for _ in range(n):
                out.append(decode_value(buf, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                klen = _read_long(buf)
                k = buf.read(klen).decode("utf-8")
                out[k] = decode_value(buf, schema["values"])
        return out
    if t == "string":
        return buf.read(_read_long(buf)).decode("utf-8")
    if t == "bytes":
        return buf.read(_read_long(buf))
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "boolean":
        return buf.read(1) == b"\x01"
    raise TypeError(f"unsupported Avro type {t!r}")


def _field(v: Any, name: str) -> Any:
    if isinstance(v, dict):
        return v.get(name)
    return getattr(v, name)  # Row


def encode_record(schema: Any, v: Any) -> bytes:
    buf = io.BytesIO()
    encode_value(buf, schema, v)
    return buf.getvalue()


def decode_record(schema: Any, raw: bytes) -> Any:
    return decode_value(io.BytesIO(raw), schema)


# ---------------------------------------------------------------------------
# DataFrame surface
# ---------------------------------------------------------------------------

#: Confluent Schema-Registry wire framing: magic 0 + big-endian schema id.
WIRE_MAGIC = b"\x00"


def wire_frame(payload: bytes, schema_id: int) -> bytes:
    return WIRE_MAGIC + struct.pack(">I", schema_id) + payload


def unwire(frame: bytes) -> tuple[int, bytes]:
    if frame[:1] != WIRE_MAGIC:
        raise ValueError("not a Schema-Registry-framed Avro message")
    return struct.unpack(">I", frame[1:5])[0], frame[5:]


def to_avro_udf(dt: T.DataType, *, schema_id: int | None = None):
    """pandas UDF: struct column -> Avro binary (optionally wire-framed).

    Struct columns reach a pandas UDF as a pd.DataFrame of fields; nested
    structs arrive as dicts — encode_value handles both."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    schema = avro_schema_of(dt)

    # no type hints: a struct column reaches the UDF as a pd.DataFrame,
    # and PySpark's hint inference rejects the DataFrame->Series signature
    def enc(col):
        rows = col.to_dict("records")
        out = []
        for r in rows:
            raw = encode_record(schema, r)
            out.append(wire_frame(raw, schema_id) if schema_id is not None else raw)
        return pd.Series(out)

    return pandas_udf(enc, "binary")


def from_avro_udf(dt: T.DataType, *, framed: bool = False):
    """pandas UDF: Avro binary -> struct column of type `dt`.

    Logical types come back as their raw encoding (timestamps as epoch
    micros, dates as epoch days) — pass a `dt` without Timestamp/Date
    fields or convert after.  With the spark-avro jar this is
    `from_avro(col, json.dumps(avro_schema_of(dt)))`."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _has_temporal(t: T.DataType) -> bool:
        if isinstance(t, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            return True
        if isinstance(t, T.StructType):
            return any(_has_temporal(f.dataType) for f in t.fields)
        if isinstance(t, T.ArrayType):
            return _has_temporal(t.elementType)
        if isinstance(t, T.MapType):
            return _has_temporal(t.keyType) or _has_temporal(t.valueType)
        return False

    if _has_temporal(dt):
        raise TypeError(
            "from_avro_udf returns logical types raw (micros/days) — "
            "declare those fields long/int (at any nesting depth) and "
            "convert after decode"
        )
    schema = avro_schema_of(dt)

    def dec(col):
        rows = []
        for raw in col:
            payload = unwire(bytes(raw))[1] if framed else bytes(raw)
            rows.append(decode_record(schema, payload))
        return pd.DataFrame(rows, columns=[f.name for f in dt.fields])

    return pandas_udf(dec, dt)


# ---------------------------------------------------------------------------
# Avro Object Container Files (spec §"Object Container Files")
# ---------------------------------------------------------------------------
# Iceberg manifest lists and manifest files are Avro OCFs; this gives the
# jarless Iceberg metadata source (sources/iceberg_meta.py) a writer and a
# writer-agnostic reader on top of the same binary codec.  Layout per the
# Avro 1.11 spec: magic "Obj\x01", a file-metadata map (avro.schema JSON +
# avro.codec + caller keys), a 16-byte sync marker, then blocks of
# <count, byte-size, payload, sync>.  Codecs: null and deflate (raw zlib,
# no header, per spec).

OCF_MAGIC = b"Obj\x01"

_OCF_META_SCHEMA = {"type": "map", "values": "bytes"}


def _ocf_sync(schema_json: str, n: int) -> bytes:
    """Deterministic 16-byte sync marker (content-derived, so identical
    inputs produce byte-identical files — fixture/golden friendly)."""
    import hashlib

    return hashlib.md5(
        schema_json.encode("utf-8") + n.to_bytes(8, "big")
    ).digest()


def write_container(
    path: str,
    schema: Any,
    records: list,
    *,
    metadata: dict[str, bytes | str] | None = None,
    codec: str = "deflate",
) -> None:
    """Write one Avro Object Container File (single block)."""
    import json as _json
    import zlib

    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported OCF codec {codec!r}")
    schema_json = _json.dumps(schema)
    meta = {"avro.schema": schema_json, "avro.codec": codec}
    for k, v in (metadata or {}).items():
        meta[k] = v.decode("utf-8") if isinstance(v, (bytes, bytearray)) else v
    sync = _ocf_sync(schema_json, len(records))

    buf = io.BytesIO()
    buf.write(OCF_MAGIC)
    encode_value(
        buf, _OCF_META_SCHEMA, {k: str(v).encode("utf-8") for k, v in meta.items()}
    )
    buf.write(sync)
    if records:
        block = io.BytesIO()
        for rec in records:
            encode_value(block, schema, rec)
        payload = block.getvalue()
        if codec == "deflate":
            payload = zlib.compress(payload)[2:-4]  # raw, per spec
        _write_long(buf, len(records))
        _write_long(buf, len(payload))
        buf.write(payload)
        buf.write(sync)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(buf.getvalue())
    os.replace(tmp, path)


def read_container(path: str) -> tuple[Any, dict[str, bytes], list]:
    """Read an Avro OCF written by ANY writer: the schema embedded in the
    file header drives decoding, so readers stay compatible with files
    whose schema carries extra (e.g. Iceberg column-stats) fields.
    Returns (schema, file_metadata, records)."""
    import json as _json
    import zlib

    with open(path, "rb") as fh:
        buf = io.BytesIO(fh.read())
    if buf.read(4) != OCF_MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    meta = decode_value(buf, _OCF_META_SCHEMA)
    schema = _json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"{path}: unsupported OCF codec {codec!r}")
    sync = buf.read(16)
    records: list = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        n = _read_long(buf)
        size = _read_long(buf)
        payload = buf.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        block = io.BytesIO(payload)
        for _ in range(n):
            records.append(decode_value(block, schema))
        if buf.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch (corrupt block)")
    return schema, meta, records
