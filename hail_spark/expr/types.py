"""Hail type-system parity (ref hail/python/hail/expr/types.py) on
Spark's type objects.

The reference's ``tint32 / tarray(...) / tstruct(...)`` family and the
``dtype("array<int32>")`` string parser are how users spell schemas
(import_table ``types=``, literal construction, assertions).  Here each
``t*`` name produces the corresponding ``pyspark.sql.types.DataType``,
so the result plugs directly into Spark APIs (``createDataFrame``,
``from_json``, casts); ``dtype`` parses the reference's type-string
grammar into the same objects.

Engine-specific encodings (documented divergences):
* ``tcall`` — struct<GT:int,ploidy:int,phased:boolean> (the engine's
  parsed-call shape, io/vcf.py parse_call).
* ``tlocus`` — struct<contig:string,position:int> regardless of the
  reference genome parameter (the genome governs functions, not
  storage).
* ``tndarray(t, n)`` — n nested Spark arrays of ``t`` (expr/ndarray.py
  layout).
* ``tstream`` — same as ``tarray`` (Catalyst has no stream type).
"""

from __future__ import annotations

from pyspark.sql import types as T

HailType = T.DataType
hail_type = T.DataType

tvoid = T.NullType()
tbool = T.BooleanType()
tint32 = T.IntegerType()
tint64 = T.LongType()
tfloat32 = T.FloatType()
tfloat64 = T.DoubleType()
tstr = T.StringType()
tbinary = T.BinaryType()
tint = tint32
tfloat = tfloat64

tcall = T.StructType(
    [
        T.StructField("GT", T.IntegerType()),
        T.StructField("ploidy", T.IntegerType()),
        T.StructField("phased", T.BooleanType()),
    ]
)


def tlocus(reference_genome: str = "default") -> T.StructType:
    return T.StructType(
        [
            T.StructField("contig", T.StringType()),
            T.StructField("position", T.IntegerType()),
        ]
    )


def tarray(element_type: T.DataType) -> T.ArrayType:
    return T.ArrayType(element_type)


def tstream(element_type: T.DataType) -> T.ArrayType:
    return T.ArrayType(element_type)


def tset(element_type: T.DataType) -> T.ArrayType:
    # sets are canonicalized sorted-distinct arrays in this engine
    # (expr/functions.py set_)
    return T.ArrayType(element_type)


def tdict(key_type: T.DataType, value_type: T.DataType) -> T.MapType:
    return T.MapType(key_type, value_type)


def tstruct(**field_types: T.DataType) -> T.StructType:
    return T.StructType([T.StructField(k, v) for k, v in field_types.items()])


def ttuple(*types: T.DataType) -> T.StructType:
    # reference tuples are structs with positional fields `0`, `1`, ...
    return T.StructType([T.StructField(str(i), t) for i, t in enumerate(types)])


def tinterval(point_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("start", point_type),
            T.StructField("end", point_type),
            T.StructField("includes_start", T.BooleanType()),
            T.StructField("includes_end", T.BooleanType()),
        ]
    )


def tndarray(element_type: T.DataType, ndim: int) -> T.DataType:
    t = element_type
    for _ in range(ndim):
        t = T.ArrayType(t)
    return t


# HTS entry schema constant (ref expr/types.py hts_entry_schema)
hts_entry_schema = tstruct(
    GT=tcall, AD=tarray(tint32), DP=tint32, GQ=tint32, PL=tarray(tint32)
)


# ------------------------------------------------------------------ #
# dtype(): the reference's type-string grammar → Spark types
# ------------------------------------------------------------------ #
_SIMPLE = {
    "void": tvoid,
    "bool": tbool,
    "int32": tint32,
    "int64": tint64,
    "int": tint32,
    "float32": tfloat32,
    "float64": tfloat64,
    "float": tfloat64,
    "str": tstr,
    "binary": tbinary,
    "call": tcall,
}


class _Parser:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def _ws(self):
        while self.i < len(self.s) and self.s[self.i].isspace():
            self.i += 1

    def _eat(self, tok: str):
        self._ws()
        if not self.s.startswith(tok, self.i):
            raise ValueError(f"dtype: expected {tok!r} at {self.i} in {self.s!r}")
        self.i += len(tok)

    def _ident(self) -> str:
        self._ws()
        j = self.i
        while j < len(self.s) and (self.s[j].isalnum() or self.s[j] in "_?"):
            j += 1
        out = self.s[self.i : j]
        self.i = j
        return out

    def parse(self) -> T.DataType:
        self._ws()
        name = self._ident()
        if name.startswith("+") or name.startswith("?"):
            name = name.lstrip("+?")
        if name in _SIMPLE:
            return _SIMPLE[name]
        if name in ("array", "set", "stream"):
            self._eat("<")
            el = self.parse()
            self._eat(">")
            return T.ArrayType(el)
        if name == "ndarray":
            self._eat("<")
            el = self.parse()
            self._eat(",")
            self._ws()
            j = self.i
            while j < len(self.s) and self.s[j].isdigit():
                j += 1
            ndim = int(self.s[self.i : j])
            self.i = j
            self._eat(">")
            return tndarray(el, ndim)
        if name == "dict":
            self._eat("<")
            k = self.parse()
            self._eat(",")
            v = self.parse()
            self._eat(">")
            return T.MapType(k, v)
        if name == "interval":
            self._eat("<")
            pt = self.parse()
            self._eat(">")
            return tinterval(pt)
        if name == "locus":
            self._ws()
            if self.i < len(self.s) and self.s[self.i] == "<":
                self._eat("<")
                self._ident()
                self._eat(">")
            return tlocus()
        if name == "struct":
            self._eat("{")
            fields = []
            self._ws()
            if self.s[self.i] != "}":
                while True:
                    self._ws()
                    if self.s[self.i] == "`":  # backtick-quoted field name
                        end = self.s.index("`", self.i + 1)
                        fname = self.s[self.i + 1 : end]
                        self.i = end + 1
                    else:
                        fname = self._ident()
                    self._eat(":")
                    fields.append(T.StructField(fname, self.parse()))
                    self._ws()
                    if self.s[self.i] == ",":
                        self.i += 1
                        continue
                    break
            self._eat("}")
            return T.StructType(fields)
        if name == "tuple":
            self._eat("(")
            types = []
            self._ws()
            if self.s[self.i] != ")":
                while True:
                    types.append(self.parse())
                    self._ws()
                    if self.s[self.i] == ",":
                        self.i += 1
                        continue
                    break
            self._eat(")")
            return ttuple(*types)
        raise ValueError(f"dtype: unknown type {name!r} in {self.s!r}")


def dtype(type_str: str) -> T.DataType:
    """Parse a reference type string — ``dtype('array<struct{x: int32,
    y: str}>')`` — into the Spark type this engine stores it as (ref
    expr/types.py:151 ``dtype``)."""
    p = _Parser(type_str)
    out = p.parse()
    p._ws()
    if p.i != len(type_str):
        raise ValueError(f"dtype: trailing input at {p.i} in {type_str!r}")
    return out


def impute_type(x) -> T.DataType:
    """Infer the engine type of a Python value (ref expr/types.py
    ``impute_type``)."""
    import numpy as np

    if x is None:
        return tvoid
    if isinstance(x, bool):
        return tbool
    if isinstance(x, (int, np.integer)):
        return tint32 if -(2**31) <= int(x) < 2**31 else tint64
    if isinstance(x, (float, np.floating)):
        return tfloat64
    if isinstance(x, str):
        return tstr
    if isinstance(x, (bytes, bytearray)):
        return tbinary
    if isinstance(x, dict):
        if not x:
            raise ValueError("impute_type: cannot impute an empty dict")
        k = next(iter(x))
        return tdict(impute_type(k), impute_type(x[k]))
    if isinstance(x, tuple):
        return ttuple(*[impute_type(v) for v in x])
    if isinstance(x, (list, set, frozenset)):
        seq = list(x)
        if not seq:
            raise ValueError("impute_type: cannot impute an empty collection")
        return tarray(impute_type(seq[0]))
    if isinstance(x, np.ndarray):
        return tndarray(impute_type(x.flat[0].item()), x.ndim)
    if hasattr(x, "items"):  # Struct / Mapping
        return tstruct(**{k: impute_type(v) for k, v in x.items()})
    raise ValueError(f"impute_type: unsupported value {type(x)}")


def is_numeric(t: T.DataType) -> bool:
    return isinstance(t, T.NumericType)


def is_primitive(t: T.DataType) -> bool:
    return isinstance(t, (T.NumericType, T.BooleanType, T.StringType, T.BinaryType))


def is_container(t: T.DataType) -> bool:
    return isinstance(t, (T.ArrayType, T.MapType))


def is_compound(t: T.DataType) -> bool:
    return isinstance(t, (T.ArrayType, T.MapType, T.StructType))


def types_match(left: T.DataType, right: T.DataType) -> bool:
    return left == right
