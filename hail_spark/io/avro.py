"""Pure-Python Avro Object Container File codec.

Parity target: ``hl.import_avro`` (ref impex.py:3345; Scala
io/avro/AvroTableReader.scala). pip pyspark does not bundle the
spark-avro jar, so ``import_avro`` (io/impex.py) first tries the
native ``spark.read.format("avro")`` and falls back to this decoder:
the file list is parallelized and each container file is decoded ON AN
EXECUTOR inside mapInPandas — a real distributed read (one task per
file, the same granularity the reference's AvroPartitionReader uses),
not a driver-side collect.

Format per the public Avro 1.11 spec (Object Container Files): magic
``Obj\\x01``, a file-metadata map carrying the writer schema JSON and
codec, a 16-byte sync marker, then length-prefixed blocks each followed
by the sync marker. Scalars are zigzag-varint / little-endian IEEE.

Supported writer schemas: records of primitives, nullable unions
(["null", T] in either order), arrays, maps, enums, fixed, and nested
records (flattened one level into struct columns). deflate and null
codecs (zlib ships with CPython); snappy raises a clear error.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Any, BinaryIO

_MAGIC = b"Obj\x01"

# ------------------------------------------------------------------ #
# primitive decoders
# ------------------------------------------------------------------ #


def _read_long(buf: BinaryIO) -> int:
    """zigzag varint."""
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _read_bytes(buf: BinaryIO) -> bytes:
    n = _read_long(buf)
    out = buf.read(n)
    if len(out) != n:
        raise EOFError("truncated bytes")
    return out


def _skip_to_schema(schema):
    """Resolve named-type references lazily — not needed for the
    supported subset; placeholder keeps the decoder honest about it."""
    return schema


def _decode(schema: Any, buf: BinaryIO) -> Any:
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return buf.read(1) == b"\x01"
        if t in ("int", "long"):
            return _read_long(buf)
        if t == "float":
            return struct.unpack("<f", buf.read(4))[0]
        if t == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if t == "bytes":
            return _read_bytes(buf)
        if t == "string":
            return _read_bytes(buf).decode("utf-8")
        raise NotImplementedError(f"avro: unsupported named type reference '{t}'")
    if isinstance(schema, list):  # union
        idx = _read_long(buf)
        if not 0 <= idx < len(schema):
            raise ValueError(f"avro: union branch {idx} out of range")
        return _decode(schema[idx], buf)
    t = schema["type"]
    if t == "record":
        return {f["name"]: _decode(f["type"], buf) for f in schema["fields"]}
    if t == "enum":
        return schema["symbols"][_read_long(buf)]
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix
                n = -n
                _read_long(buf)
            for _ in range(n):
                out.append(_decode(schema["items"], buf))
        return out
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(schema["values"], buf)
        return out
    if t in ("null", "boolean", "int", "long", "float", "double", "bytes", "string"):
        return _decode(t, buf)
    raise NotImplementedError(f"avro: unsupported schema type {t!r}")


# ------------------------------------------------------------------ #
# container file
# ------------------------------------------------------------------ #


def read_avro_header(buf: BinaryIO) -> tuple[dict, str, bytes]:
    """→ (writer schema dict, codec, sync marker)."""
    if buf.read(4) != _MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            _read_long(buf)
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(
            f"avro codec '{codec}' not supported by the pure-Python fallback "
            "(null/deflate only); use the spark-avro jar for snappy/zstd files"
        )
    sync = buf.read(16)
    return schema, codec, sync


def read_avro_file(path: str) -> tuple[dict, list[dict]]:
    """Decode one container file → (writer schema, rows). Top-level
    schema must be a record; rows come back as plain dicts."""
    with open(path, "rb") as f:
        buf = io.BytesIO(f.read())
    schema, codec, sync = read_avro_header(buf)
    if not (isinstance(schema, dict) and schema.get("type") == "record"):
        raise NotImplementedError("avro: top-level schema must be a record")
    rows: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        count = _read_long(buf)
        block = _read_bytes(buf)
        if buf.read(16) != sync:
            raise ValueError("avro: sync marker mismatch (corrupt block)")
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        bb = io.BytesIO(block)
        for _ in range(count):
            rows.append(_decode(schema, bb))
    return schema, rows


def avro_to_spark_schema(schema: dict):
    """Writer record schema → Spark StructType."""
    from pyspark.sql import types as T

    prim = {
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "bytes": T.BinaryType(),
        "string": T.StringType(),
    }

    def conv(s):
        if isinstance(s, str):
            if s == "null":
                return T.NullType()
            return prim[s]
        if isinstance(s, list):
            branches = [b for b in s if b != "null"]
            if len(branches) != 1:
                raise NotImplementedError("avro: only ['null', T] unions supported")
            return conv(branches[0])
        t = s["type"]
        if t == "record":
            return T.StructType(
                [T.StructField(f["name"], conv(f["type"]), True) for f in s["fields"]]
            )
        if t == "enum":
            return T.StringType()
        if t == "fixed":
            return T.BinaryType()
        if t == "array":
            return T.ArrayType(conv(s["items"]), True)
        if t == "map":
            return T.MapType(T.StringType(), conv(s["values"]), True)
        if t in prim:
            return prim[t]
        raise NotImplementedError(f"avro: unsupported type {t!r}")

    return conv(schema)


# ------------------------------------------------------------------ #
# encoder (fixture/test support + export symmetry)
# ------------------------------------------------------------------ #


def _write_long(out: bytearray, v: int) -> None:
    v = (v << 1) ^ (v >> 63)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            break


def _write_bytes(out: bytearray, b: bytes) -> None:
    _write_long(out, len(b))
    out.extend(b)


def _encode(schema: Any, v: Any, out: bytearray) -> None:
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return
        if t == "boolean":
            out.append(1 if v else 0)
        elif t in ("int", "long"):
            _write_long(out, int(v))
        elif t == "float":
            out.extend(struct.pack("<f", float(v)))
        elif t == "double":
            out.extend(struct.pack("<d", float(v)))
        elif t == "bytes":
            _write_bytes(out, bytes(v))
        elif t == "string":
            _write_bytes(out, v.encode("utf-8"))
        else:
            raise NotImplementedError(t)
        return
    if isinstance(schema, list):
        if v is None and "null" in schema:
            idx = schema.index("null")
            _write_long(out, idx)
            return
        for i, b in enumerate(schema):
            if b != "null":
                _write_long(out, i)
                _encode(b, v, out)
                return
        raise ValueError("union without non-null branch")
    t = schema["type"]
    if t == "record":
        for f in schema["fields"]:
            _encode(f["type"], v[f["name"]], out)
    elif t == "enum":
        _write_long(out, schema["symbols"].index(v))
    elif t == "fixed":
        out.extend(v)
    elif t == "array":
        if v:
            _write_long(out, len(v))
            for x in v:
                _encode(schema["items"], x, out)
        _write_long(out, 0)
    elif t == "map":
        if v:
            _write_long(out, len(v))
            for k, x in v.items():
                _write_bytes(out, k.encode("utf-8"))
                _encode(schema["values"], x, out)
        _write_long(out, 0)
    else:
        _encode(t, v, out)


def write_avro_file(
    path: str, schema: dict, rows: list[dict], codec: str = "null"
) -> None:
    """Minimal OCF writer (single block) — fixture support for the
    reader tests and a jar-free export path for small sidecar files."""
    if codec not in ("null", "deflate"):
        raise NotImplementedError("write_avro_file: null/deflate codecs only")
    sync = bytes(
        (zlib.crc32(json.dumps(schema, sort_keys=True).encode()) + i) & 0xFF
        for i in range(16)
    )
    out = bytearray()
    out.extend(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode("utf-8"))
        _write_bytes(out, v)
    _write_long(out, 0)
    out.extend(sync)
    body = bytearray()
    for r in rows:
        _encode(schema, r, body)
    blob = bytes(body)
    if codec == "deflate":
        co = zlib.compressobj(9, zlib.DEFLATED, -15)
        blob = co.compress(blob) + co.flush()
    _write_long(out, len(rows))
    _write_bytes(out, blob)
    out.extend(sync)
    with open(path, "wb") as f:
        f.write(bytes(out))
