"""Read reference-written native ``.ht`` / ``.mt`` directories.

Interop on-ramp (r03 verdict item 5): a user migrating from the
reference (hail-is/hail) has existing tables on disk in its native
format — spec JSONs + binary row streams. This is a pure-Python
decoder of that PUBLIC on-disk format, so those files import directly
into our Table / MatrixTable without a re-export through the reference.

Format (all reference file:line cites):

* directory spec — ``metadata.json.gz`` with ``TableSpec`` /
  ``MatrixTableSpec`` components (rvd/AbstractRVDSpec.scala:224;
  components point at nested RVD dirs, each with its own
  ``metadata.json.gz`` carrying the codec spec).
* buffer specs — io/BufferSpecs.scala:14-50. Supported here:
  ``StreamBlockBufferSpec`` ([int32 LE len][bytes] blocks),
  ``StreamBlockBufferSpec2`` ([varint len][bytes]),
  ``BlockingBufferSpec`` (flat concatenation — the writer never lets a
  value straddle a block, InputBuffers.scala:326 ``ensure``),
  ``ZstdBlockBufferSpec`` ([int32 LE decompLen][zstd frame] per block,
  InputBuffers.scala:614), ``LEB128BufferSpec`` (readInt/readLong
  become unsigned LEB128 varints, compatibility/LegacyBufferSpecs
  .scala:42). ``LZ4BlockBufferSpec`` variants decode via the pure-Python
  LZ4 block decompressor below (``_lz4_decompress_block``).
* row stream — per row a ``1`` byte then the encoded row; ``0``
  terminates (sparkextras RichContextRDDRegionValue.scala:51,62).
* value encoding — types/encoded/*.scala: ``EBaseStruct`` leads with a
  missing-bit byte array over its OPTIONAL fields (bit 1 = missing)
  then present fields in order; ``EArray`` is [length][element missing
  bits if optional][elements]; ``EBinary`` is [length][bytes];
  ``EInt32``/``EInt64`` read via the buffer's readInt/readLong;
  ``EFloat32``/``EFloat64`` are LE IEEE; ``EBoolean`` one byte;
  ``EVarint`` always varint; ``ENDArrayColumnMajor`` is [nDims longs
  shape][elements column-major] (ENDArrayColumnMajor.scala:40).
  ``+`` prefix in the EType string = required (EType.scala:440 parser).

Zstd blocks: no Python zstd module ships here, so each part's zstd
frames are concatenated and decompressed in ONE external ``zstd -d``
subprocess per part (frames are self-delimiting), then re-split by the
recorded lengths — one process per part, not per 64 KiB block.

Spark shape: part files are a parallelized RDD (one task per part) and
each task decodes its part independently — the same per-partition
parallelism the reference's reader has. The decode itself is
interpreted Python (this is an import on-ramp, not a query path);
convert to parquet once via ``Table.write`` and query from there.

Virtual-type → Spark mapping: Locus → struct<contig,position>;
Interval[T] → struct<start,end,includes_start,includes_end>; Call →
the raw int32 call encoding; Set[T] → array<T>; Dict[K,V] →
array<struct<key,value>>; Tuple[...] → struct<`0`,`1`,...>;
NDArray[T,n] → struct<shape:array<bigint>, data:array<T>> (row-major,
matching expr/ndarray.py).
"""

from __future__ import annotations

import gzip
import json
import os
import re
import struct
import subprocess

from pyspark.sql import SparkSession

__all__ = ["read_table", "read_matrix_table"]


# ------------------------------------------------------------------ #
# type-string parsers (EType grammar: encoded/EType.scala:440;
# virtual types: the Table/Matrix type strings in metadata.json.gz)
# ------------------------------------------------------------------ #

_TOKEN = re.compile(
    r"`(?:[^`\\]|\\.)*`"      # backticked identifier
    r"|[A-Za-z_][A-Za-z0-9_]*"  # bare identifier
    r"|\d+"                    # integer literal
    r"|[+\[\]{}(),:]"          # punctuation
)


def _tokenize(s: str) -> list[str]:
    return _TOKEN.findall(s)


def _unquote(tok: str) -> str:
    if tok.startswith("`"):
        return tok[1:-1].replace("\\`", "`").replace("\\\\", "\\")
    return tok


class _Toks:
    def __init__(self, s: str):
        self.toks = _tokenize(s)
        self.i = 0

    def peek(self) -> str:
        return self.toks[self.i]

    def next(self) -> str:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, t: str) -> None:
        got = self.next()
        if got != t:
            raise ValueError(f"expected {t!r}, got {got!r} at {self.i}")


class EType:
    __slots__ = ("kind", "required", "children", "fields", "ndims")

    def __init__(self, kind, required, children=(), fields=(), ndims=0):
        self.kind = kind
        self.required = required
        self.children = list(children)
        self.fields = list(fields)  # [(name, EType)] for EBaseStruct
        self.ndims = ndims


def parse_etype(s: str) -> EType:
    return _parse_etype(_Toks(s))


def _parse_etype(t: _Toks) -> EType:
    req = False
    if t.peek() == "+":
        t.next()
        req = True
    name = t.next()
    if name in ("EBoolean", "EInt32", "EInt64", "EFloat32", "EFloat64", "EVarint"):
        return EType(name, req)
    if name in ("EBinary", "EBinaryLegacyFullWidthIntegerLength"):
        return EType("EBinary", req)
    if name == "EBinary2":
        return EType("EBinary2", req)
    if name in ("EArray", "EArrayLegacyFullWidthIntegerLength", "EArray2"):
        t.expect("[")
        elem = _parse_etype(t)
        t.expect("]")
        return EType("EArray2" if name == "EArray2" else "EArray", req, children=[elem])
    if name == "ENDArrayColumnMajor":
        t.expect("[")
        elem = _parse_etype(t)
        t.expect(",")
        nd = int(t.next())
        t.expect("]")
        return EType("ENDArrayColumnMajor", req, children=[elem], ndims=nd)
    if name == "EBaseStruct":
        t.expect("{")
        fields = []
        if t.peek() != "}":
            while True:
                fname = _unquote(t.next())
                t.expect(":")
                fields.append((fname, _parse_etype(t)))
                if t.peek() == ",":
                    t.next()
                    continue
                break
        t.expect("}")
        return EType("EBaseStruct", req, fields=fields)
    raise NotImplementedError(f"EType {name} not supported by this reader")


class VType:
    __slots__ = ("kind", "children", "fields", "arg", "required")

    def __init__(self, kind, children=(), fields=(), arg=None, required=False):
        self.kind = kind
        self.children = list(children)
        self.fields = list(fields)
        self.arg = arg
        self.required = required


def parse_vtype(s: str) -> VType:
    return _parse_vtype(_Toks(s))


_V_ATOMS = {
    "Int32", "Int64", "Float32", "Float64", "String", "Boolean", "Call",
    "Binary",
}


def _parse_vtype(t: _Toks) -> VType:
    req = False
    if t.peek() == "+":  # legacy requiredness markers (pre-EType specs)
        t.next()
        req = True
    name = t.next()
    out = _parse_vtype_body(t, name)
    out.required = req
    return out


def _parse_vtype_body(t: _Toks, name: str) -> VType:
    if name == "Int":
        return VType("Int32")
    if name in _V_ATOMS:
        return VType(name)
    if name == "Locus":
        t.expect("(")
        rg = t.next()
        t.expect(")")
        return VType("Locus", arg=_unquote(rg))
    if name in ("Array", "Set"):
        t.expect("[")
        elem = _parse_vtype(t)
        t.expect("]")
        return VType(name, children=[elem])
    if name == "Dict":
        t.expect("[")
        k = _parse_vtype(t)
        t.expect(",")
        v = _parse_vtype(t)
        t.expect("]")
        return VType("Dict", children=[k, v])
    if name == "Interval":
        t.expect("[")
        pt = _parse_vtype(t)
        t.expect("]")
        return VType("Interval", children=[pt])
    if name == "NDArray":
        t.expect("[")
        elem = _parse_vtype(t)
        t.expect(",")
        nd = int(t.next())
        t.expect("]")
        return VType("NDArray", children=[elem], arg=nd)
    if name == "Tuple":
        t.expect("[")
        elems = []
        if t.peek() != "]":
            while True:
                elems.append(_parse_vtype(t))
                if t.peek() == ",":
                    t.next()
                    continue
                break
        t.expect("]")
        return VType("Tuple", children=elems)
    if name == "Struct":
        t.expect("{")
        fields = []
        if t.peek() != "}":
            while True:
                fname = _unquote(t.next())
                t.expect(":")
                fields.append((fname, _parse_vtype(t)))
                if t.peek() == ",":
                    t.next()
                    continue
                break
        t.expect("}")
        return VType("Struct", fields=fields)
    raise NotImplementedError(f"virtual type {name} not supported by this reader")


def legacy_etype(vt: VType) -> EType:
    """EType reconstruction for pre-EType ``PackCodecSpec`` files —
    field-for-field the reference's
    compatibility/LegacyEncodedTypeParser.scala:12 rules (Locus subfields
    required, Interval includes* required EBoolean, Dict element struct
    required, lengths full-width int32)."""
    k, req = vt.kind, vt.required
    if k == "Boolean":
        return EType("EBoolean", req)
    if k in ("Int32", "Call"):
        return EType("EInt32", req)
    if k == "Int64":
        return EType("EInt64", req)
    if k == "Float32":
        return EType("EFloat32", req)
    if k == "Float64":
        return EType("EFloat64", req)
    if k in ("String", "Binary"):
        return EType("EBinary", req)
    if k == "Locus":
        return EType(
            "EBaseStruct",
            req,
            fields=[
                ("contig", EType("EBinary", True)),
                ("position", EType("EInt32", True)),
            ],
        )
    if k in ("Array", "Set"):
        return EType("EArray", req, children=[legacy_etype(vt.children[0])])
    if k == "Dict":
        elem = EType(
            "EBaseStruct",
            True,
            fields=[
                ("key", legacy_etype(vt.children[0])),
                ("value", legacy_etype(vt.children[1])),
            ],
        )
        return EType("EArray", req, children=[elem])
    if k == "Interval":
        pt = legacy_etype(vt.children[0])
        return EType(
            "EBaseStruct",
            req,
            fields=[
                ("start", pt),
                ("end", pt),
                ("includesStart", EType("EBoolean", True)),
                ("includesEnd", EType("EBoolean", True)),
            ],
        )
    if k == "Tuple":
        return EType(
            "EBaseStruct",
            req,
            fields=[(str(i), legacy_etype(c)) for i, c in enumerate(vt.children)],
        )
    if k == "Struct":
        return EType(
            "EBaseStruct",
            req,
            fields=[(n, legacy_etype(c)) for n, c in vt.fields],
        )
    raise NotImplementedError(f"legacy pack codec for virtual type {k}")


def vtype_to_spark_ddl(vt: VType) -> str:
    """Spark DDL string for a decoded virtual type."""
    k = vt.kind
    if k == "Int32":
        return "int"
    if k == "Int64":
        return "bigint"
    if k == "Float32":
        return "float"
    if k == "Float64":
        return "double"
    if k == "String":
        return "string"
    if k == "Boolean":
        return "boolean"
    if k == "Binary":
        return "binary"
    if k == "Call":
        return "int"
    if k == "Locus":
        return "struct<contig:string,position:int>"
    if k in ("Array", "Set"):
        return f"array<{vtype_to_spark_ddl(vt.children[0])}>"
    if k == "Dict":
        kd = vtype_to_spark_ddl(vt.children[0])
        vd = vtype_to_spark_ddl(vt.children[1])
        return f"array<struct<key:{kd},value:{vd}>>"
    if k == "Interval":
        p = vtype_to_spark_ddl(vt.children[0])
        return (
            f"struct<start:{p},end:{p},includes_start:boolean,"
            "includes_end:boolean>"
        )
    if k == "NDArray":
        e = vtype_to_spark_ddl(vt.children[0])
        return f"struct<shape:array<bigint>,data:array<{e}>>"
    if k == "Tuple":
        inner = ",".join(
            f"`{i}`:{vtype_to_spark_ddl(c)}" for i, c in enumerate(vt.children)
        )
        return f"struct<{inner}>"
    if k == "Struct":
        inner = ",".join(
            f"`{n}`:{vtype_to_spark_ddl(c)}" for n, c in vt.fields
        )
        return f"struct<{inner}>"
    raise NotImplementedError(k)


# ------------------------------------------------------------------ #
# buffer / block layer
# ------------------------------------------------------------------ #

def _read_varint(f) -> int | None:
    b = f.read(1)
    if not b:
        return None
    b0 = b[0]
    x = b0 & 0x7F
    shift = 7
    while b0 & 0x80:
        b0 = f.read(1)[0]
        x |= (b0 & 0x7F) << shift
        shift += 7
    return x


def _iter_stream_blocks(f, varint_len: bool):
    """Innermost layer: StreamBlockBufferSpec(2) block framing."""
    while True:
        if varint_len:
            n = _read_varint(f)
            if n is None:
                return
        else:
            hdr = f.read(4)
            if len(hdr) < 4:
                return
            n = struct.unpack("<i", hdr)[0]
        yield f.read(n)


def _zstd_decompress_blocks(blocks: list[bytes]) -> list[bytes]:
    """Each block is [int32 LE decompLen][one complete zstd frame]
    (InputBuffers.scala:614). Preferred path: pyarrow's bundled zstd
    codec (C-speed, in-process, needs the decompressed size — which the
    block header records). Fallback: frames are self-delimiting, so ONE
    ``zstd -d`` subprocess decompresses the concatenation and the
    output splits back by the recorded lengths."""
    if not blocks:
        return []
    lens = [struct.unpack("<i", b[:4])[0] for b in blocks]
    try:
        import pyarrow as pa

        codec = pa.Codec("zstd")
        return [
            codec.decompress(b[4:], decompressed_size=n, asbytes=True)
            for b, n in zip(blocks, lens)
        ]
    except (ImportError, ValueError, NotImplementedError):
        pass
    frames = b"".join(b[4:] for b in blocks)
    proc = subprocess.run(
        ["zstd", "-d", "-c"], input=frames, capture_output=True, check=True
    )
    out = proc.stdout
    if len(out) != sum(lens):
        raise IOError(
            f"zstd decompression length mismatch: {len(out)} != {sum(lens)}"
        )
    res, off = [], 0
    for n in lens:
        res.append(out[off : off + n])
        off += n
    return res


def _lz4_block_decompress(src: bytes, decomp_len: int) -> bytes:
    """Raw LZ4 block decompression (the net.jpountz/lz4-java block
    format Hail's LZ4InputBlockBuffer consumes — token nibbles, 255-
    extended lengths, 2-byte LE match offsets, overlap-safe copies).
    Pure Python: no lz4 module ships in this environment."""
    dst = bytearray(decomp_len)
    si, di, n = 0, 0, len(src)
    while si < n and di < decomp_len:
        token = src[si]
        si += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[si]
                si += 1
                lit += b
                if b != 255:
                    break
        dst[di : di + lit] = src[si : si + lit]
        di += lit
        si += lit
        if di >= decomp_len or si >= n:
            break
        offset = src[si] | (src[si + 1] << 8)
        si += 2
        mlen = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                b = src[si]
                si += 1
                mlen += b
                if b != 255:
                    break
        if offset >= mlen:
            start = di - offset
            dst[di : di + mlen] = dst[start : start + mlen]
            di += mlen
        else:  # overlapping match: byte-at-a-time (RLE-style)
            for _ in range(mlen):
                dst[di] = dst[di - offset]
                di += 1
    if di != decomp_len:
        raise IOError(f"lz4 block decoded {di} bytes, expected {decomp_len}")
    return bytes(dst)


def read_part_bytes(path: str, buffer_spec: dict) -> tuple[bytes, bool]:
    """Decode the buffer-spec tree for one part file; returns
    (flat value bytes, leb128) where leb128 means readInt/readLong are
    varints. Flat concatenation is sound because BlockingInputBuffer
    only refills at exact block ends (InputBuffers.scala:331)."""
    leb = False
    spec = buffer_spec
    if spec["name"] == "LEB128BufferSpec":
        leb = True
        spec = spec["child"]
    if spec["name"] == "StreamBufferSpec":
        with open(path, "rb") as f:
            return f.read(), leb
    if spec["name"] != "BlockingBufferSpec":
        raise NotImplementedError(f"buffer spec {spec['name']}")
    chain = []
    child = spec["child"]
    while child["name"] not in ("StreamBlockBufferSpec", "StreamBlockBufferSpec2"):
        chain.append(child["name"])
        child = child.get("child")
        if child is None:
            raise NotImplementedError("unterminated block-spec chain")
    varint_len = child["name"] == "StreamBlockBufferSpec2"
    with open(path, "rb") as f:
        blocks = list(_iter_stream_blocks(f, varint_len))
    for layer in reversed(chain):
        if layer == "ZstdBlockBufferSpec":
            blocks = _zstd_decompress_blocks(blocks)
        elif layer in (
            "LZ4BlockBufferSpec",
            "LZ4HCBlockBufferSpec",
            "LZ4FastBlockBufferSpec",
        ):
            # same [int32 LE decompLen][payload] framing as zstd
            # (InputBuffers.scala:533); HC/Fast differ only on the
            # COMPRESS side — one raw-block decoder serves both
            blocks = [
                _lz4_block_decompress(b[4:], struct.unpack("<i", b[:4])[0])
                for b in blocks
            ]
        else:
            raise NotImplementedError(f"block spec {layer}")
    return b"".join(blocks), leb


class _Buf:
    """Value-layer reader over the flat decoded bytes."""

    __slots__ = ("b", "i", "leb")

    def __init__(self, b: bytes, leb: bool):
        self.b = b
        self.i = 0
        self.leb = leb

    def read_byte(self) -> int:
        v = self.b[self.i]
        self.i += 1
        return v

    def read_varint(self) -> int:
        b0 = self.b[self.i]
        self.i += 1
        x = b0 & 0x7F
        shift = 7
        while b0 & 0x80:
            b0 = self.b[self.i]
            self.i += 1
            x |= (b0 & 0x7F) << shift
            shift += 7
        return x

    def read_int(self) -> int:
        if self.leb:
            # unsigned LEB128 of the raw two's-complement bits
            # (InputBuffers.scala readVarint) — sign-extend from 32
            v = self.read_varint() & 0xFFFFFFFF
            return v - 0x100000000 if v >= 0x80000000 else v
        v = struct.unpack_from("<i", self.b, self.i)[0]
        self.i += 4
        return v

    def read_long(self) -> int:
        if self.leb:
            v = self.read_varint() & 0xFFFFFFFFFFFFFFFF
            return v - 0x10000000000000000 if v >= 0x8000000000000000 else v
        v = struct.unpack_from("<q", self.b, self.i)[0]
        self.i += 8
        return v

    def read_float(self) -> float:
        v = struct.unpack_from("<f", self.b, self.i)[0]
        self.i += 4
        return v

    def read_double(self) -> float:
        v = struct.unpack_from("<d", self.b, self.i)[0]
        self.i += 8
        return v

    def read_bytes(self, n: int) -> bytes:
        v = self.b[self.i : self.i + n]
        self.i += n
        return v


# ------------------------------------------------------------------ #
# value decoding (EType drives bytes, VType drives the Python shape)
# ------------------------------------------------------------------ #

def _decode(buf: _Buf, et: EType, vt: VType | None):
    k = et.kind
    if k == "EBoolean":
        return buf.read_byte() != 0
    if k == "EInt32":
        return buf.read_int()
    if k == "EInt64":
        return buf.read_long()
    if k == "EVarint":
        # raw two's-complement bits as unsigned LEB128; the virtual type
        # picks the width (EVarint.scala decodes per requested type)
        v = buf.read_varint()
        if vt is not None and vt.kind == "Int64":
            v &= 0xFFFFFFFFFFFFFFFF
            return v - 0x10000000000000000 if v >= 0x8000000000000000 else v
        v &= 0xFFFFFFFF
        return v - 0x100000000 if v >= 0x80000000 else v
    if k == "EFloat32":
        return buf.read_float()
    if k == "EFloat64":
        return buf.read_double()
    if k in ("EBinary", "EBinary2"):
        n = buf.read_int() if k == "EBinary" else buf.read_varint()
        raw = buf.read_bytes(n)
        if vt is not None and vt.kind != "String":
            return raw
        return raw.decode("utf-8")
    if k in ("EArray", "EArray2"):
        n = buf.read_int() if k == "EArray" else buf.read_varint()
        elem_et = et.children[0]
        elem_vt = _array_elem_vtype(vt)
        missing = None
        if not elem_et.required:
            nbytes = (n + 7) // 8
            mb = buf.read_bytes(nbytes)
            missing = [bool(mb[i >> 3] & (1 << (i & 7))) for i in range(n)]
        out = []
        for i in range(n):
            if missing is not None and missing[i]:
                out.append(None)
            else:
                out.append(_decode(buf, elem_et, elem_vt))
        return _finish_container(out, vt)
    if k == "EBaseStruct":
        opt = [i for i, (_, fet) in enumerate(et.fields) if not fet.required]
        missing = set()
        if opt:
            nbytes = (len(opt) + 7) // 8
            mb = buf.read_bytes(nbytes)
            for j, fi in enumerate(opt):
                if mb[j >> 3] & (1 << (j & 7)):
                    missing.add(fi)
        vals = {}
        vmap = _struct_field_vtypes(vt, et)
        for i, (fname, fet) in enumerate(et.fields):
            if i in missing:
                vals[fname] = None
            else:
                vals[fname] = _decode(buf, fet, vmap.get(fname))
        return _finish_struct(vals, vt, et)
    if k == "ENDArrayColumnMajor":
        shape = [buf.read_long() for _ in range(et.ndims)]
        total = 1
        for s in shape:
            total *= s
        elem_et = et.children[0]
        elem_vt = vt.children[0] if vt is not None and vt.kind == "NDArray" else None
        flat_cm = [_decode(buf, elem_et, elem_vt) for _ in range(total)]
        # column-major stream → row-major data array (expr/ndarray.py order)
        if len(shape) <= 1 or total == 0:
            data = flat_cm
        else:
            import numpy as np

            data = (
                np.asarray(flat_cm)
                .reshape(shape, order="F")
                .reshape(-1, order="C")
                .tolist()
            )
        return {"shape": [int(s) for s in shape], "data": data}
    raise NotImplementedError(k)


def _array_elem_vtype(vt: VType | None) -> VType | None:
    if vt is None:
        return None
    if vt.kind in ("Array", "Set"):
        return vt.children[0]
    if vt.kind == "Dict":
        return VType(
            "Struct", fields=[("key", vt.children[0]), ("value", vt.children[1])]
        )
    return None


def _finish_container(out: list, vt: VType | None):
    if vt is not None and vt.kind == "Dict":
        return [{"key": e["key"], "value": e["value"]} for e in out]
    return out


def _struct_field_vtypes(vt: VType | None, et: EType) -> dict:
    if vt is None:
        return {}
    if vt.kind == "Struct":
        return dict(vt.fields)
    if vt.kind == "Locus":
        return {"contig": VType("String"), "position": VType("Int32")}
    if vt.kind == "Interval":
        p = vt.children[0]
        return {
            "start": p,
            "end": p,
            "includesStart": VType("Boolean"),
            "includesEnd": VType("Boolean"),
        }
    if vt.kind == "Tuple":
        return {str(i): c for i, c in enumerate(vt.children)}
    return {}


def _finish_struct(vals: dict, vt: VType | None, et: EType):
    if vt is not None and vt.kind == "Interval":
        return {
            "start": vals.get("start"),
            "end": vals.get("end"),
            "includes_start": vals.get("includesStart"),
            "includes_end": vals.get("includesEnd"),
        }
    return vals


def decode_rows(data: bytes, leb: bool, et: EType, vt: VType | None):
    """Iterate decoded rows of one part (1-byte row marker framing)."""
    buf = _Buf(data, leb)
    while True:
        marker = buf.read_byte()
        if marker == 0:
            return
        yield _decode(buf, et, vt)


# ------------------------------------------------------------------ #
# directory-level readers
# ------------------------------------------------------------------ #

def _load_json_gz(path: str) -> dict:
    with gzip.open(path, "rt") as f:
        return json.load(f)


def _rvd_spec(rvd_dir: str) -> dict:
    return _load_json_gz(os.path.join(rvd_dir, "metadata.json.gz"))


def _codec_of(spec: dict) -> tuple[str | None, str, dict]:
    """(etype string | None, vtype string, buffer spec) for either a
    TypedCodecSpec or a legacy PackCodecSpec (pre-1.2 files; the EType
    is then synthesized from the virtual type via ``legacy_etype``)."""
    cs = spec.get("_codecSpec") or spec.get("codecSpec")
    if cs["name"] == "TypedCodecSpec":
        return cs["_eType"], cs["_vType"], cs["_bufferSpec"]
    if cs["name"] == "PackCodecSpec":
        if "rowType" in spec:  # UnpartitionedRVDSpec
            return None, spec["rowType"], cs["child"]
        rvd_type = spec.get("rvdType") or spec.get("orvdType")
        inner = rvd_type[rvd_type.index("{") + 1 : rvd_type.rindex("}")]
        # row:Struct{...} section (key:[[...]] precedes it)
        ridx = inner.index("row:")
        return None, inner[ridx + 4 :], cs["child"]
    raise NotImplementedError(f"codec spec {cs['name']}")


def _etype_for(etype_s: str | None, vt: VType) -> EType:
    return parse_etype(etype_s) if etype_s is not None else legacy_etype(vt)


def _rvd_decode_all(rvd_dir: str, vt: VType | None) -> list:
    """Driver-side decode of a whole (small) RVD — globals/cols."""
    spec = _rvd_spec(rvd_dir)
    etype_s, vtype_s, bspec = _codec_of(spec)
    if vt is None:
        vt = parse_vtype(vtype_s)
    et = _etype_for(etype_s, vt)
    parts = spec.get("_partFiles") or spec.get("partFiles")
    out = []
    for p in parts:
        data, leb = read_part_bytes(os.path.join(rvd_dir, "parts", p), bspec)
        out.extend(decode_rows(data, leb, et, vt))
    return out


def _rvd_dataframe(spark: SparkSession, rvd_dir: str):
    """Distributed decode: one Spark task per part file."""
    spec = _rvd_spec(rvd_dir)
    etype_s, vtype_s, bspec = _codec_of(spec)
    parts = spec.get("_partFiles") or spec.get("partFiles")
    vt = parse_vtype(vtype_s)
    ddl = vtype_to_spark_ddl(vt)
    paths = [os.path.join(rvd_dir, "parts", p) for p in parts]

    def decode_part(path: str):
        vt_ = parse_vtype(vtype_s)
        et = _etype_for(etype_s, vt_)
        data, leb = read_part_bytes(path, bspec)
        yield from decode_rows(data, leb, et, vt_)

    rdd = spark.sparkContext.parallelize(paths, max(len(paths), 1)).flatMap(
        decode_part
    )
    return spark.createDataFrame(rdd, ddl), vt


def _table_type_parts(type_str: str) -> dict:
    """Split 'Table{global:...,key:[...],row:...}' into its sections."""
    inner = type_str[type_str.index("{") + 1 : type_str.rindex("}")]
    out = {}
    i = 0
    depth = 0
    start = 0
    while i <= len(inner):
        if i == len(inner) or (inner[i] == "," and depth == 0):
            seg = inner[start:i]
            c = seg.index(":")
            out[seg[:c]] = seg[c + 1 :]
            start = i + 1
        elif inner[i] in "{[(":
            depth += 1
        elif inner[i] in "}])":
            depth -= 1
        i += 1
    return out


def _parse_key_list(s: str) -> list[str]:
    # "[idx]" or "[[locus],[alleles]]" → flat names
    return [t for t in re.findall(r"[A-Za-z_][A-Za-z0-9_]*", s)]


def read_table(spark: SparkSession, path: str):
    """Read a reference-written ``.ht`` directory into a Table."""
    from ..table import Table

    meta = _load_json_gz(os.path.join(path, "metadata.json.gz"))
    if meta.get("name") != "TableSpec":
        raise ValueError(f"{path} is not a native Table (got {meta.get('name')})")
    sections = _table_type_parts(meta["table_type"])
    key = _parse_key_list(sections.get("key", "[]"))
    comps = meta["components"]
    df, _ = _rvd_dataframe(spark, os.path.join(path, comps["rows"]["rel_path"]))
    globals_ = {}
    if "globals" in comps:
        grows = _rvd_decode_all(
            os.path.join(path, comps["globals"]["rel_path"]), None
        )
        if grows:
            globals_ = grows[0]
    return Table(df, tuple(key), globals=globals_)


def read_matrix_table(spark: SparkSession, path: str):
    """Read a reference-written ``.mt`` directory into a MatrixTable."""
    from ..matrixtable import ENTRIES, MatrixTable

    meta = _load_json_gz(os.path.join(path, "metadata.json.gz"))
    if meta.get("name") != "MatrixTableSpec":
        raise ValueError(
            f"{path} is not a native MatrixTable (got {meta.get('name')})"
        )
    sections = _table_type_parts(meta["matrix_type"])
    row_key = _parse_key_list(sections.get("row_key", "[]"))
    col_key = _parse_key_list(sections.get("col_key", "[]"))
    comps = meta["components"]
    cols = _rvd_decode_all(os.path.join(path, comps["cols"]["rel_path"]), None)
    globals_ = {}
    if "globals" in comps:
        grows = _rvd_decode_all(
            os.path.join(path, comps["globals"]["rel_path"]), None
        )
        if grows:
            globals_ = grows[0]

    # rows and entries RVDs are identically partitioned and row-aligned;
    # decode both in the SAME task per part index and zip positionally
    rows_dir = os.path.join(path, comps["rows"]["rel_path"])
    ents_dir = os.path.join(path, comps["entries"]["rel_path"])
    rspec, espec = _rvd_spec(rows_dir), _rvd_spec(ents_dir)
    r_et_s, r_vt_s, r_b = _codec_of(rspec)
    e_et_s, e_vt_s, e_b = _codec_of(espec)
    rparts = rspec.get("_partFiles") or rspec.get("partFiles")
    eparts = espec.get("_partFiles") or espec.get("partFiles")
    if len(rparts) != len(eparts):
        raise ValueError("rows/entries partition counts differ")
    r_vt = parse_vtype(r_vt_s)
    e_vt = parse_vtype(e_vt_s)
    ent_field, ent_arr_vt = e_vt.fields[0]
    row_ddl = vtype_to_spark_ddl(r_vt)[len("struct<") : -1]
    ddl = f"struct<{row_ddl},`{ENTRIES}`:{vtype_to_spark_ddl(ent_arr_vt)}>"
    pairs = [
        (os.path.join(rows_dir, "parts", rp), os.path.join(ents_dir, "parts", ep))
        for rp, ep in zip(rparts, eparts)
    ]

    def decode_pair(pair):
        rpath, epath = pair
        rvt = parse_vtype(r_vt_s)
        evt = parse_vtype(e_vt_s)
        ret = _etype_for(r_et_s, rvt)
        eet = _etype_for(e_et_s, evt)
        rdata, rleb = read_part_bytes(rpath, r_b)
        edata, eleb = read_part_bytes(epath, e_b)
        rit = decode_rows(rdata, rleb, ret, rvt)
        eit = decode_rows(edata, eleb, eet, evt)
        for row, erow in zip(rit, eit):
            row[ENTRIES] = erow[ent_field]
            yield row

    rdd = spark.sparkContext.parallelize(pairs, max(len(pairs), 1)).flatMap(
        decode_pair
    )
    df = spark.createDataFrame(rdd, ddl)
    return MatrixTable(df, tuple(row_key), cols, tuple(col_key), globals=globals_)
