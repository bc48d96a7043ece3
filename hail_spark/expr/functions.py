"""Scalar/collection function library — ``hl.*`` expression parity.

Parity target: hail/python/hail/expr/functions.py (7360 LoC, ~200 public
functions) + typed-expression methods (typed_expressions.py). Everything
here returns a Spark ``Column`` built from JVM-side builtins/HOFs so it
stays inside whole-stage codegen; only the statistical distributions drop
to vectorized pandas UDFs (see functions/stats.py).

Hail missingness is strict (NA in ⇒ NA out), which is also Spark's
default for these builtins, so no wrappers are needed except where noted
(floor-division, filter, ordering).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    if isinstance(x, Column):
        return x
    return F.lit(x)


def col(name: str) -> Column:
    return F.col(name)


# ---------------------------------------------------------------------- #
# control / missingness (ref functions.py:473-2235)
# ---------------------------------------------------------------------- #
def if_else(cond, consequent, alternate) -> Column:
    return F.when(_c(cond), _c(consequent)).otherwise(_c(alternate))


cond = if_else


def coalesce(*exprs) -> Column:
    return F.coalesce(*[_c(e) for e in exprs])


def or_else(expr, alternate) -> Column:
    return F.coalesce(_c(expr), _c(alternate))


def or_missing(pred, value) -> Column:
    return F.when(_c(pred), _c(value))


def is_defined(expr) -> Column:
    return _c(expr).isNotNull()


def is_missing(expr) -> Column:
    return _c(expr).isNull()


def missing(dtype: str) -> Column:
    return F.lit(None).cast(dtype)


def is_nan(expr) -> Column:
    return F.isnan(_c(expr))


def is_finite(expr) -> Column:
    x = _c(expr)
    return ~F.isnan(x) & (F.abs(x) != float("inf")) & x.isNotNull()


def is_infinite(expr) -> Column:
    return F.abs(_c(expr)) == float("inf")


class case:
    """hl.case() builder (ref functions.py:585)."""

    def __init__(self, missing_false: bool = False):
        self._whens: list[tuple[Column, Column]] = []
        self._missing_false = missing_false

    def when(self, cond, value) -> "case":
        self._whens.append((_c(cond), _c(value)))
        return self

    def default(self, value) -> Column:
        out = None
        for c, v in self._whens:
            out = F.when(c, v) if out is None else out.when(c, v)
        return out.otherwise(_c(value)) if out is not None else _c(value)

    def or_missing(self) -> Column:
        out = None
        for c, v in self._whens:
            out = F.when(c, v) if out is None else out.when(c, v)
        return out


def switch(expr) -> "_Switch":
    return _Switch(_c(expr))


class _Switch:
    """hl.switch builder (ref functions.py:619)."""

    def __init__(self, base: Column):
        self._base = base
        self._whens: list[tuple[Column, Column]] = []
        self._when_missing: Column | None = None

    def when(self, value, then) -> "_Switch":
        self._whens.append((self._base == _c(value), _c(then)))
        return self

    def when_missing(self, then) -> "_Switch":
        self._when_missing = _c(then)
        return self

    def default(self, value) -> Column:
        out = None
        if self._when_missing is not None:
            out = F.when(self._base.isNull(), self._when_missing)
        for c, v in self._whens:
            out = F.when(c, v) if out is None else out.when(c, v)
        return out.otherwise(_c(value)) if out is not None else _c(value)

    def or_missing(self) -> Column:
        out = None
        if self._when_missing is not None:
            out = F.when(self._base.isNull(), self._when_missing)
        for c, v in self._whens:
            out = F.when(c, v) if out is None else out.when(c, v)
        return out


def bind(f: Callable, *exprs) -> Column:
    """Let-binding (ref functions.py:656). Catalyst CSE makes plain
    re-use safe, so bind is just application."""
    return f(*[_c(e) for e in exprs])


rbind = bind


# ---------------------------------------------------------------------- #
# arithmetic / math (ref functions.py:1117-5027, MathFunctions.scala)
# ---------------------------------------------------------------------- #
exp = F.exp
log10 = F.log10
sqrt = F.sqrt


def log(x, base=None) -> Column:
    return F.log(_c(x)) if base is None else F.log(base, _c(x))


def abs(x) -> Column:  # noqa: A001
    return F.abs(_c(x))


def sign(x) -> Column:
    return F.signum(_c(x))


def floor(x) -> Column:
    return F.floor(_c(x))


def ceil(x) -> Column:
    return F.ceil(_c(x))


def floordiv(a, b) -> Column:
    """Hail // is floor division (ref RoundToNegInfDivide,
    Simplify.scala:232) — Spark int `/` truncates toward 0; use floor."""
    return F.floor(_c(a) / _c(b)).cast("bigint")


def mod(a, b) -> Column:
    """Hail % follows the sign of the divisor (floor-mod) → pmod."""
    return F.pmod(_c(a), _c(b))


def pow(a, b) -> Column:  # noqa: A001
    return F.pow(_c(a), _c(b))


def triangle(n) -> Column:
    return (_c(n) * (_c(n) + 1) / 2).cast("bigint")


def approx_equal(x, y, tolerance: float = 1e-6, absolute: bool = False) -> Column:
    xx, yy = _c(x), _c(y)
    if absolute:
        return F.abs(xx - yy) <= tolerance
    return F.abs(xx - yy) <= tolerance * F.greatest(F.abs(xx), F.abs(yy))


# ---------------------------------------------------------------------- #
# strings (ref typed_expressions.py:2779-3343, StringFunctions.scala)
# ---------------------------------------------------------------------- #
def str_replace(s, pattern: str, replacement: str) -> Column:
    return F.regexp_replace(_c(s), pattern, replacement)


def str_split(s, pattern: str, n: int = -1) -> Column:
    return F.split(_c(s), pattern, n)


lower = F.lower
upper = F.upper


def strip(s) -> Column:
    return F.trim(_c(s))


def str_contains(s, sub: str) -> Column:
    return _c(s).contains(sub)


def startswith(s, prefix: str) -> Column:
    return _c(s).startswith(prefix)


def endswith(s, suffix: str) -> Column:
    return _c(s).endswith(suffix)


def matches(s, regex: str) -> Column:
    """Hail .matches = regex found anywhere (java find semantics)."""
    return _c(s).rlike(regex)


def first_match_in(s, regex: str) -> Column:
    """Groups of first regex match, or missing (ref typed_expressions
    first_match_in)."""
    x = _c(s)
    m = F.regexp_extract_all(x, F.lit(regex))
    return F.when(F.size(m) > 0, F.element_at(m, 1))


def translate(s, matching: str, replace: str) -> Column:
    return F.translate(_c(s), matching, replace)


def reverse(s) -> Column:
    return F.reverse(_c(s))


def str_join(sep: str, arr) -> Column:
    return F.array_join(_c(arr), sep)


def str_len(s) -> Column:
    return F.length(_c(s)).cast("int")


def substring(s, start, length=None) -> Column:
    x = _c(s)
    if length is None:
        return x.substr(F.lit(start + 1), F.length(x))
    return x.substr(F.lit(start + 1), F.lit(length))


def format(fmt: str, *args) -> Column:
    """hl.format (ref functions.py:6783) — C-style format."""
    return F.format_string(fmt, *[_c(a) for a in args])


def json(expr) -> Column:
    return F.to_json(_c(expr))


def parse_json(s, dtype: str) -> Column:
    return F.from_json(_c(s), dtype)


def entropy(s) -> Column:
    """Shannon entropy of character distribution (ref functions.py:3972).
    Pure HOF implementation — stays JVM-side."""
    chars = F.split(_c(s), "")
    chars = F.filter(chars, lambda ch: ch != "")
    n = F.size(chars)
    distinct = F.array_distinct(chars)
    return F.aggregate(
        distinct,
        F.lit(0.0),
        lambda acc, ch: acc
        - (F.size(F.filter(chars, lambda e: e == ch)) / n)
        * F.log2(F.size(F.filter(chars, lambda e: e == ch)) / n),
    )


def hamming(s1, s2) -> Column:
    """Hamming distance of equal-length strings (ref functions.py:3941)."""
    a, b = F.split(_c(s1), ""), F.split(_c(s2), "")
    return F.when(
        F.length(_c(s1)) == F.length(_c(s2)),
        F.size(F.filter(F.zip_with(a, b, lambda x, y: x != y), lambda d: d)),
    ).cast("int")


def strftime(fmt: str, epoch_seconds, tz: str = "UTC") -> Column:
    return F.date_format(F.from_unixtime(_c(epoch_seconds)), _c_fmt(fmt))


def strptime(s, fmt: str, tz: str = "UTC") -> Column:
    return F.unix_timestamp(_c(s), _c_fmt(fmt)).cast("bigint")


def _c_fmt(c_format: str) -> str:
    """Map the common C strftime codes to JVM datetime patterns."""
    table = {
        "%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH", "%M": "mm",
        "%S": "ss", "%j": "DDD", "%e": "d", "%b": "MMM", "%B": "MMMM",
        "%y": "yy", "%p": "a", "%A": "EEEE", "%a": "EEE",
    }
    out = c_format
    for k, v in table.items():
        out = out.replace(k, v)
    return out


# ---------------------------------------------------------------------- #
# collections (ref functions.py:4118-5762, typed_expressions.py:64-786)
# ---------------------------------------------------------------------- #
def map_(f, arr) -> Column:
    return F.transform(_c(arr), f)


def filter_(f, arr) -> Column:
    return F.filter(_c(arr), f)


def flatmap(f, arr) -> Column:
    return F.flatten(F.transform(_c(arr), f))


def fold(f, zero, arr) -> Column:
    return F.aggregate(_c(arr), _c(zero), f)


def array_scan(f, zero, arr) -> Column:
    """Inclusive scan over an array (ref functions.py array_scan).
    aggregate with array accumulator."""
    z = _c(zero)
    return F.aggregate(
        _c(arr),
        F.array(z),
        lambda acc, x: F.concat(acc, F.array(f(F.element_at(acc, -1), x))),
    )


def any_(*args) -> Column:
    """hl.any (ref functions.py:4159), three forms: any(f, collection),
    any(collection-of-bools), any(bool, bool, ...).  A single bare
    boolean argument parses as the (trivial) collection form only if it
    is an array; Columns are typeless here, so the one-argument form
    assumes a collection — spell any(x, lit(False)) for a lone bool."""
    if len(args) == 2 and callable(args[0]):
        return F.exists(_c(args[1]), args[0])
    if len(args) == 1:
        return F.exists(_c(args[0]), lambda x: x)
    out = _c(args[0])
    for a in args[1:]:
        out = out | _c(a)
    return out


def all_(*args) -> Column:
    """hl.all (ref functions.py:4228) — same three forms as any_."""
    if len(args) == 2 and callable(args[0]):
        return F.forall(_c(args[1]), args[0])
    if len(args) == 1:
        return F.forall(_c(args[0]), lambda x: x)
    out = _c(args[0])
    for a in args[1:]:
        out = out & _c(a)
    return out


def find(f, arr) -> Column:
    matches_ = F.filter(_c(arr), f)
    return F.when(F.size(matches_) > 0, F.element_at(matches_, 1))


def sorted_(arr, key=None, reverse: bool = False) -> Column:
    """hl.sorted (ref functions.py:5706) incl. the ``key`` function —
    a comparator-sort on key(x) with nulls last, like the reference."""
    a = _c(arr)
    if key is None:
        out = F.array_sort(a)
    else:
        def cmp(l, r):
            kl, kr = key(l), key(r)
            return (
                F.when(kl.isNull() & kr.isNull(), 0)
                .when(kl.isNull(), 1)
                .when(kr.isNull(), -1)
                .when(kl < kr, -1)
                .when(kl > kr, 1)
                .otherwise(0)
            )

        out = F.array_sort(a, cmp)
    return F.reverse(out) if reverse else out


def zip_(*arrs, fill_missing: bool = False) -> Column:
    """hl.zip (ref functions.py:4474): truncates to the SHORTEST array
    by default; ``fill_missing=True`` extends to the longest with nulls
    (Spark's arrays_zip native behavior)."""
    cols = [_c(a) for a in arrs]
    if fill_missing or len(cols) == 1:
        return F.arrays_zip(*cols)
    shortest = cols[0] if len(cols) == 1 else F.least(*[F.size(c) for c in cols])
    return F.slice(F.arrays_zip(*cols), 1, shortest)


def enumerate_(arr, start: int = 0, *, index_first: bool = True) -> Column:
    """hl.enumerate (ref functions.py:4532): (index, element) tuples,
    index FIRST by default like the reference."""
    a = _c(arr)
    idx = F.sequence(F.lit(start), F.size(a) - 1 + start)
    if index_first:
        return F.zip_with(idx, a, lambda i, x: F.struct(i.alias("_0"), x.alias("_1")))
    return F.zip_with(a, idx, lambda x, i: F.struct(x.alias("_0"), i.alias("_1")))


def argmin(arr) -> Column:
    a = _c(arr)
    return F.when(F.size(a) > 0, F.array_position(a, F.array_min(a)).cast("int") - 1)


def argmax(arr) -> Column:
    a = _c(arr)
    return F.when(F.size(a) > 0, F.array_position(a, F.array_max(a)).cast("int") - 1)


def mean_(arr) -> Column:
    a = F.filter(_c(arr), lambda x: x.isNotNull())
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x) / F.size(a)


def median_(arr) -> Column:
    """hl.median (ref functions.py:5095): the middle element of the
    sorted non-missing values — even length takes the LOWER middle
    (the reference doctest: median([1,3,5,6,7,9]) == 5), preserving
    the element type (no float averaging)."""
    a = F.array_sort(F.filter(_c(arr), lambda x: x.isNotNull()))
    n = F.size(a)
    return F.when(n > 0, F.element_at(a, ((n + 1) / 2).cast("int")))


def product_(arr) -> Column:
    return F.aggregate(
        F.filter(_c(arr), lambda x: x.isNotNull()),
        F.lit(1.0),
        lambda acc, x: acc * x,
    )


def sum_(arr) -> Column:
    return F.aggregate(
        F.filter(_c(arr), lambda x: x.isNotNull()), F.lit(0.0), lambda acc, x: acc + x
    )


def cumulative_sum(arr) -> Column:
    a = _c(arr)
    return F.aggregate(
        a,
        F.expr("cast(array() as array<double>)"),
        lambda acc, x: F.concat(
            acc, F.array(F.coalesce(F.element_at(acc, -1), F.lit(0.0)) + x)
        ),
    )


flatten = F.flatten


def len_(x) -> Column:
    return F.size(_c(x))


def reversed_(arr) -> Column:
    return F.reverse(_c(arr))


def array_slice(arr, start=None, stop=None, step: int = 1) -> Column:
    """Python slice semantics over an array column — negative indices,
    negative steps, out-of-range clamping — matching the reference's
    ArraySlice (ref hail/hail/src/is/hail/expr/ir/defs ArraySlice;
    expressions tested at test_expr.py:256). Pure Column expression:
    a bounded index sequence gathered with element_at."""
    if step == 0:
        raise ValueError("step cannot be 0 for array slice")
    a = _c(arr)
    n = F.size(a)

    def norm(i, default):
        if i is None:
            return default
        c = F.lit(i) if isinstance(i, int) else _c(i)
        return F.when(c < 0, c + n).otherwise(c)

    def clamp(c, lo, hi):
        return F.greatest(F.least(c, hi), lo)

    if step > 0:
        s = clamp(norm(start, F.lit(0)), F.lit(0), n)
        e = clamp(norm(stop, n), F.lit(0), n)
        idx = F.when(s < e, F.sequence(s, e - 1, F.lit(step))).otherwise(
            F.array().cast("array<int>")
        )
    else:
        s = clamp(norm(start, n - 1), F.lit(-1), n - 1)
        e = clamp(norm(stop, F.lit(-1)), F.lit(-1), n - 1)
        idx = F.when(s > e, F.sequence(s, e + 1, F.lit(step))).otherwise(
            F.array().cast("array<int>")
        )
    return F.when(
        a.isNotNull(), F.transform(idx, lambda i: F.element_at(a, i.cast("int") + 1))
    )


def index_of(arr, value) -> Column:
    return F.array_position(_c(arr), _c(value)).cast("int") - 1


def contains(arr, value) -> Column:
    return F.array_contains(_c(arr), _c(value))


def append(arr, value) -> Column:
    return F.concat(_c(arr), F.array(_c(value)))


def extend(a1, a2) -> Column:
    return F.concat(_c(a1), _c(a2))


def head_(arr) -> Column:
    a = _c(arr)
    return F.when(F.size(a) > 0, F.element_at(a, 1))


first_ = head_


def last_(arr) -> Column:
    a = _c(arr)
    return F.when(F.size(a) > 0, F.element_at(a, -1))


def grouped(arr, size: int) -> Column:
    a = _c(arr)
    n_groups = F.ceil(F.size(a) / F.lit(size)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_groups - 1),
        lambda i: F.slice(a, i * size + 1, size),
    )


def range_(start, stop=None, step: int = 1) -> Column:
    if stop is None:
        start, stop = F.lit(0), _c(start)
    else:
        start, stop = _c(start), _c(stop)
    # hl.range is end-exclusive; F.sequence is end-inclusive
    return F.when(
        stop > start if step > 0 else stop < start,
        F.sequence(start, stop - (1 if step > 0 else -1), F.lit(step)),
    ).otherwise(F.expr("cast(array() as array<int>)"))


def group_by_(f, arr) -> Column:
    """collection.group_by → map<key, array<value>>."""
    a = _c(arr)
    keys = F.array_distinct(F.transform(a, f))
    return F.map_from_arrays(
        keys, F.transform(keys, lambda k: F.filter(a, lambda x: f(x).eqNullSafe(k)))
    )


# ---------------------------------------------------------------------- #
# set ops on sorted-distinct arrays (ref SetFunctions.scala; tset repr)
# ---------------------------------------------------------------------- #
def set_(arr) -> Column:
    return F.array_sort(F.array_distinct(_c(arr)))


def set_union(a, b) -> Column:
    return F.array_sort(F.array_union(_c(a), _c(b)))


def set_intersection(a, b) -> Column:
    return F.array_sort(F.array_intersect(_c(a), _c(b)))


def set_difference(a, b) -> Column:
    return F.array_sort(F.array_except(_c(a), _c(b)))


def is_subset(a, b) -> Column:
    return F.size(F.array_except(_c(a), _c(b))) == 0


# ---------------------------------------------------------------------- #
# dict ops (ref DictFunctions.scala; tdict → MapType)
# ---------------------------------------------------------------------- #
def dict_get(m, key, default=None) -> Column:
    got = F.element_at(_c(m), _c(key) if isinstance(key, Column) else key)
    return F.coalesce(got, _c(default)) if default is not None else got


def dict_contains(m, key) -> Column:
    return F.map_contains_key(_c(m), key)


def dict_keys(m) -> Column:
    return F.array_sort(F.map_keys(_c(m)))


def dict_values(m) -> Column:
    return F.map_values(_c(m))


def dict_items(m) -> Column:
    return F.map_entries(_c(m))


def dict_from_entries(arr) -> Column:
    return F.map_from_entries(_c(arr))


# ---------------------------------------------------------------------- #
# conversions / parsing (ref functions.py:5852-6254)
# ---------------------------------------------------------------------- #
def int32(x) -> Column:
    return _c(x).cast("int")


def int64(x) -> Column:
    return _c(x).cast("bigint")


def float32(x) -> Column:
    return _c(x).cast("float")


def float64(x) -> Column:
    return _c(x).cast("double")


def bool_(x) -> Column:
    return _c(x).cast("boolean")


def str_(x) -> Column:
    return _c(x).cast("string")


def parse_int32(s) -> Column:
    """Missing on parse failure (ref parse_int) — try_cast semantics."""
    return _c(s).try_cast("int")


def parse_int64(s) -> Column:
    return _c(s).try_cast("bigint")


def parse_float64(s) -> Column:
    return _c(s).try_cast("double")


# ---------------------------------------------------------------------- #
# bit ops (ref functions.py:6890-7085)
# ---------------------------------------------------------------------- #
def bit_and(a, b) -> Column:
    return _c(a).bitwiseAND(_c(b))


def bit_or(a, b) -> Column:
    return _c(a).bitwiseOR(_c(b))


def bit_xor(a, b) -> Column:
    return _c(a).bitwiseXOR(_c(b))


def bit_lshift(a, n) -> Column:
    return F.shiftleft(_c(a), n)


def bit_rshift(a, n) -> Column:
    return F.shiftright(_c(a), n)


def bit_not(a) -> Column:
    return F.bitwise_not(_c(a))


def bit_count(a) -> Column:
    return F.bit_count(_c(a))


# ---------------------------------------------------------------------- #
# intervals & loci (genomics structs; ref §2.9 intervals/loci)
# ---------------------------------------------------------------------- #
def interval(start, end, includes_start=True, includes_end=False) -> Column:
    """tinterval repr: struct{start,end,includes_start,includes_end}
    (ref functions.py:1560, types.py:1921)."""
    return F.struct(
        _c(start).alias("start"),
        _c(end).alias("end"),
        _c(includes_start).alias("includes_start"),
        _c(includes_end).alias("includes_end"),
    )


def interval_contains(iv, point) -> Column:
    """Containment with inclusivity flags (ref IntervalFunctions.scala)."""
    i, p = _c(iv), _c(point)
    lo = F.when(i.includes_start, p >= i.start).otherwise(p > i.start)
    hi = F.when(i.includes_end, p <= i.end).otherwise(p < i.end)
    return lo & hi


def interval_overlaps(i1, i2) -> Column:
    a, b = _c(i1), _c(i2)
    a_before = F.when(a.includes_end & b.includes_start, a.end < b.start).otherwise(
        a.end <= b.start
    )
    b_before = F.when(b.includes_end & a.includes_start, b.end < a.start).otherwise(
        b.end <= a.start
    )
    return ~(a_before | b_before)


def locus(contig, position) -> Column:
    """tlocus repr: struct{contig,position} (ref types.py:1826)."""
    return F.struct(_c(contig).alias("contig"), _c(position).cast("int").alias("position"))


def parse_locus(s) -> Column:
    parts = F.split(_c(s), ":")
    return locus(F.element_at(parts, 1), F.element_at(parts, 2).cast("int"))


# ---------------------------------------------------------------------- #
# calls (int-packed genotypes; ref types.py:1645-1698, CallFunctions.scala)
# Diploid unphased encoding: call = triangle-number index of (j,k) alleles.
# For biallelic: 0 = 0/0, 1 = 0/1, 2 = 1/1.
# ---------------------------------------------------------------------- #
def call_n_alt_alleles(gt) -> Column:
    return _c(gt)


def call_is_hom_ref(gt) -> Column:
    return _c(gt) == 0


def call_is_het(gt) -> Column:
    return _c(gt) == 1


def call_is_hom_var(gt) -> Column:
    return _c(gt) == 2


def call_is_non_ref(gt) -> Column:
    return _c(gt) > 0


# ---------------------------------------------------------------------- #
# randomness — seeded, deterministic per row (ref Random.scala threefry;
# we derive uniforms from xxhash64 of row uid + seed: stable across
# retries and repartitioning, unlike F.rand)
# ---------------------------------------------------------------------- #

# Global seed registry (ref hl.set_global_seed / reset_global_randomness,
# hail/__init__.py): rand_* calls that omit ``seed`` salt their hashes
# with this value instead of 0.  Unlike the reference's stateful RNG,
# draws here are pure uid-keyed functions, so the global seed is the
# only mutable randomness state there is.
_GLOBAL_SEED = 0


def set_global_seed(seed: int) -> None:
    """Set the default seed consulted by every rand_* call that does
    not pass one explicitly (ref hl.set_global_seed)."""
    global _GLOBAL_SEED
    _GLOBAL_SEED = int(seed)


def reset_global_randomness() -> None:
    """Restore the default seed of 0 (ref hl.reset_global_randomness)."""
    global _GLOBAL_SEED
    _GLOBAL_SEED = 0


def _seed(s):
    return _GLOBAL_SEED if s is None else s


# RNG engine selection (round-5 verdict item 4): 'xxhash' is the
# default JVM-side engine (codegen, zero Python, the 100-TB path);
# 'threefry' is the OPT-IN reference-parity engine — bit-exact
# Threefry-4x64 streams (expr/threefry.py, KAT-verified against the
# reference's RandomSuite vectors) with stream identity
# (nonce=0, staticID=seed, message=[row uid]). A user replaying a
# reference pipeline that consumes hl.rand_* draws selects it per call
# (engine='threefry') or globally (set_rng_engine).
_RNG_ENGINE = "xxhash"
_RNG_ENGINES = ("xxhash", "threefry")


def set_rng_engine(engine: str) -> None:
    """Select the engine used by ``rand_unif``/``rand_bool``/
    ``rand_norm`` calls that don't pass ``engine=`` explicitly:
    'xxhash' (default, JVM-side) or 'threefry' (reference bit-exact,
    Arrow-batched)."""
    if engine not in _RNG_ENGINES:
        raise ValueError(f"unknown rng engine {engine!r}; one of {_RNG_ENGINES}")
    global _RNG_ENGINE
    _RNG_ENGINE = engine


def _engine(e):
    if e is not None and e not in _RNG_ENGINES:
        raise ValueError(f"unknown rng engine {e!r}; one of {_RNG_ENGINES}")
    return _RNG_ENGINE if e is None else e


def _np_threefry_unif(uid, seed: int):
    """Vectorized reference-exact uniform in [0,1): per-row pmac state
    (message=[uid]), one batched 20-round encryption, then the
    reference's infinite-precision-real double rounding
    (Random.scala:553). Rows whose first 64 draw bits are zero
    (P = 2^-64 each) fall back to the scalar engine for the exact
    multi-word path."""
    from . import threefry as tf

    uid = np.asarray(uid, dtype=np.uint64)
    states, tweak = tf.pmac_states_single_word(0, seed & ((1 << 64) - 1), uid)
    buf = tf.encrypt_batch_states(tf.DEFAULT_KEY, tweak, states, counter=0)
    bits = buf[:, 0]
    with np.errstate(over="ignore"):
        lowbit = bits & (~bits + np.uint64(1))
    e = np.where(
        bits == 0, 0, np.log2(np.maximum(lowbit, 1).astype(np.float64))
    ).astype(np.int64)
    exponent = (1022 - e).astype(np.uint64)
    sig_src = np.where(e < 12, bits, buf[:, 1])
    res = ((exponent & np.uint64(0x7FF)) << np.uint64(52)) | (
        sig_src >> np.uint64(12)
    )
    out = res.view(np.float64).copy()
    for i in np.nonzero(bits == 0)[0]:
        eng = tf.ThreefryRandomEngine.from_pmac(0, seed, [int(uid[i])])
        out[i] = eng.next_double()
    return out


def _np_threefry_norm(uid, seed: int):
    """Reference-exact gaussian: the engine's polar method consumes a
    data-dependent number of draws (rejection loop), so this runs the
    scalar buffered engine per row — exactness over throughput; the
    opt-in parity path, not the default."""
    from . import threefry as tf

    uid = np.asarray(uid, dtype=np.int64)
    out = np.empty(uid.shape[0])
    for i, u in enumerate(uid):
        eng = tf.ThreefryRandomEngine.from_pmac(0, seed, [int(u)])
        out[i] = eng.next_gaussian()
    return out


def rand_unif(
    uid, lo=0.0, hi=1.0, seed: int | None = None, engine: str | None = None
) -> Column:
    seed = _seed(seed)
    if _engine(engine) == "threefry":
        lo_f, hi_f = float(lo), float(hi)
        return _rand_pandas_udf(
            lambda u: lo_f + _np_threefry_unif(u, seed) * (hi_f - lo_f)
        )(_c(uid).cast("long"))
    h = F.xxhash64(_c(uid), F.lit(seed))
    u = (h.cast("double") / F.lit(2.0**63)) / 2.0 + 0.5
    return F.lit(lo) + u * (F.lit(hi) - F.lit(lo))


def rand_bool(
    uid, p: float, seed: int | None = None, engine: str | None = None
) -> Column:
    return rand_unif(uid, seed=seed, engine=engine) < p


def rand_int32(uid, n, seed: int | None = None) -> Column:
    seed = _seed(seed)
    return F.pmod(F.xxhash64(_c(uid), F.lit(seed)), F.lit(n)).cast("int")


def rand_norm(
    uid, mean=0.0, sd=1.0, seed: int | None = None, engine: str | None = None
) -> Column:
    """Box-Muller over two derived uniforms (xxhash engine) or the
    reference's polar-method gaussian (threefry engine, bit-exact)."""
    seed = _seed(seed)
    if _engine(engine) == "threefry":
        mean_f, sd_f = float(mean), float(sd)
        return _rand_pandas_udf(
            lambda u: mean_f + _np_threefry_norm(u, seed) * sd_f
        )(_c(uid).cast("long"))
    u1 = rand_unif(uid, seed=seed * 2 + 1)
    u2 = rand_unif(uid, seed=seed * 2 + 2)
    z = F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * 3.141592653589793 * u2)
    return F.lit(mean) + z * F.lit(sd)


# -- distribution samplers (ref functions.py:3029-3518 rand_pois/beta/
#    gamma/cat/dirichlet/hyper). Scalar-parameter pois/cat run as pure
#    Column expressions against a driver-computed literal CDF (JVM-side,
#    codegen). beta/gamma/dirichlet/hyper use Arrow-batched pandas UDFs
#    over a vectorized splitmix64 uniform stream keyed by (uid, seed) —
#    deterministic across retries/repartitioning like rand_unif. -- #
def _np_splitmix(x):
    x = np.asarray(x, dtype=np.uint64)
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _np_unif(uid, seed: int, stream: int):
    """Vectorized uniform in (0,1) from a counter-based hash — one
    independent stream per (seed, stream) pair."""
    mix = np.uint64(seed) * np.uint64(0xA24BAED4963EE407) + np.uint64(
        stream
    ) * np.uint64(0x9FB21C651E98DF25)
    z = _np_splitmix(np.asarray(uid, dtype=np.uint64) ^ mix)
    return (z >> np.uint64(11)).astype(np.float64) * 2.0**-53 + 2.0**-54


def _np_norm(uid, seed: int, stream: int):
    u1 = _np_unif(uid, seed, 2 * stream)
    u2 = _np_unif(uid, seed, 2 * stream + 1)
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)


def _np_gamma(uid, shape, seed: int, base_stream: int = 0):
    """Marsaglia-Tsang squeeze (exact rejection, vectorized over rows;
    independent proposal streams per round). shape<1 boosted via
    Gamma(a+1)·U^{1/a}."""
    uid = np.asarray(uid, dtype=np.uint64)
    a = np.broadcast_to(np.asarray(shape, dtype=float), uid.shape).copy()
    boost = a < 1.0
    a_eff = np.where(boost, a + 1.0, a)
    d = a_eff - 1.0 / 3.0
    c = 1.0 / np.sqrt(9.0 * d)
    out = np.empty(uid.shape)
    accepted = np.zeros(uid.shape, dtype=bool)
    for r in range(64):
        z = _np_norm(uid, seed, base_stream + 3 * r)
        u = _np_unif(uid, seed, base_stream + 3 * r + 2)
        v = (1.0 + c * z) ** 3
        with np.errstate(invalid="ignore", divide="ignore"):
            ok = (
                (v > 0)
                & (np.log(u) < 0.5 * z * z + d - d * v + d * np.log(v))
                & ~accepted
            )
        out[ok] = (d * v)[ok]
        accepted |= ok
        if accepted.all():
            break
    out[~accepted] = d[~accepted]  # P(reach) < 1e-100 per row
    ub = _np_unif(uid, seed, base_stream + 997)
    out = np.where(boost, out * ub ** (1.0 / np.maximum(a, 1e-12)), out)
    return out


def _rand_pandas_udf(kernel, ret: str = "double"):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ret)
    def u(*cols):
        import pandas as pd

        arrs = [c.to_numpy() for c in cols]
        return pd.Series(kernel(*arrs))

    return u


def rand_pois(uid, lamb, seed: int | None = None) -> Column:
    """Poisson draw (ref functions.py:3029 `hl.rand_pois`). Scalar
    lamb → literal inverse-CDF (pure Column, JVM-side): value = #{cdf
    entries < u}."""
    seed = _seed(seed)
    if isinstance(lamb, (int, float)):
        from .stats import dpois

        k_max = int(lamb + 12.0 * lamb**0.5 + 24)
        pmf = np.array([dpois(k, float(lamb)) for k in range(k_max)])
        cdf = np.minimum(np.cumsum(pmf), 1.0)
        u = rand_unif(uid, seed=seed)
        arr = F.array(*[F.lit(float(x)) for x in cdf])
        return F.size(F.filter(arr, lambda c: c < u)).cast("int")

    def kernel(uids, lams):
        u = _np_unif(uids, seed, 0)
        lams = np.asarray(lams, dtype=float)
        k_max = int(np.max(lams) + 12.0 * np.max(lams) ** 0.5 + 24)
        cum = np.exp(-lams)
        pmf = np.exp(-lams)
        ks = np.zeros(len(uids))
        done = cum >= u
        for k in range(1, k_max + 1):
            pmf = pmf * lams / k
            cum = cum + pmf
            newly = ~done & (cum >= u)
            ks[newly] = k
            done |= newly
        return ks

    return _rand_pandas_udf(kernel)(_c(uid), _c(lamb)).cast("int")


def rand_gamma(uid, shape, scale=1.0, seed: int | None = None) -> Column:
    """Gamma(shape, scale) draw (ref functions.py:3440 `hl.rand_gamma`)."""
    seed = _seed(seed)

    def kernel(uids, shapes, scales):
        return _np_gamma(uids, shapes, seed) * np.asarray(scales, dtype=float)

    return _rand_pandas_udf(kernel)(
        _c(uid), _c(F.lit(shape) if isinstance(shape, (int, float)) else shape),
        _c(F.lit(scale) if isinstance(scale, (int, float)) else scale),
    )


def rand_beta(uid, a, b, seed: int | None = None) -> Column:
    """Beta(a, b) = G1/(G1+G2) over independent gamma streams (ref
    functions.py:3382 `hl.rand_beta`)."""
    seed = _seed(seed)

    def kernel(uids, aa, bb):
        g1 = _np_gamma(uids, aa, seed, base_stream=0)
        g2 = _np_gamma(uids, bb, seed, base_stream=5000)
        return g1 / (g1 + g2)

    return _rand_pandas_udf(kernel)(
        _c(uid), _c(F.lit(a) if isinstance(a, (int, float)) else a),
        _c(F.lit(b) if isinstance(b, (int, float)) else b),
    )


def rand_cat(uid, probs: list[float], seed: int | None = None) -> Column:
    """Categorical index draw from literal weights (ref
    functions.py:3333 `hl.rand_cat`) — pure Column CDF compare."""
    seed = _seed(seed)
    total = float(sum(probs))
    cdf = np.cumsum(np.asarray(probs, dtype=float) / total)[:-1]
    u = rand_unif(uid, seed=seed)
    arr = F.array(*[F.lit(float(x)) for x in cdf])
    return F.size(F.filter(arr, lambda c: c <= u)).cast("int")


def rand_dirichlet(uid, alphas: list[float], seed: int | None = None) -> Column:
    """Dirichlet(α) via normalized gammas (ref functions.py:3518)."""
    seed = _seed(seed)

    def kernel(uids):
        gs = np.stack(
            [
                _np_gamma(uids, float(a), seed, base_stream=7000 * (i + 1))
                for i, a in enumerate(alphas)
            ],
            axis=1,
        )
        tot = gs.sum(axis=1, keepdims=True)
        return list(gs / tot)

    return _rand_pandas_udf(kernel, "array<double>")(_c(uid))


def rand_hyper(uid, n_good, n_bad, n_draws, seed: int | None = None) -> Column:
    """Hypergeometric draw (ref functions.py:3487 `hl.rand_hyper`) via
    bounded inverse-CDF scan (support ≤ n_draws)."""
    seed = _seed(seed)

    def kernel(uids, ng, nb, k):
        from math import comb

        u = _np_unif(uids, seed, 0)
        ng = np.asarray(ng, dtype=np.int64)
        nb = np.asarray(nb, dtype=np.int64)
        k = np.asarray(k, dtype=np.int64)
        out = np.zeros(len(uids))
        # row-wise pmf scan; support is small (≤ k) and params are
        # usually constant per query, so the comb() memoizes well
        for i in range(len(uids)):
            denom = comb(int(ng[i] + nb[i]), int(k[i]))
            cum = 0.0
            x = max(0, int(k[i] - nb[i]))
            for x in range(max(0, int(k[i] - nb[i])), min(int(ng[i]), int(k[i])) + 1):
                cum += comb(int(ng[i]), x) * comb(int(nb[i]), int(k[i]) - x) / denom
                if cum >= u[i]:
                    break
            out[i] = x
        return out

    lit = lambda v: _c(F.lit(v) if isinstance(v, (int, float)) else v)  # noqa: E731
    return _rand_pandas_udf(kernel)(_c(uid), lit(n_good), lit(n_bad), lit(n_draws)).cast(
        "int"
    )


# ---------------------------------------------------------------------- #
# allele types (ref functions.py:3576-3941, GenotypeFunctions.scala)
# ---------------------------------------------------------------------- #
def is_snp(ref, alt) -> Column:
    r, a = _c(ref), _c(alt)
    return (F.length(r) == 1) & (F.length(a) == 1) & (r != a)


def is_mnp(ref, alt) -> Column:
    r, a = _c(ref), _c(alt)
    return (F.length(r) > 1) & (F.length(r) == F.length(a)) & (r != a)


def is_insertion(ref, alt) -> Column:
    r, a = _c(ref), _c(alt)
    return (F.length(r) < F.length(a)) & a.startswith(r)


def is_deletion(ref, alt) -> Column:
    r, a = _c(ref), _c(alt)
    return (F.length(r) > F.length(a)) & r.startswith(a)


def is_indel(ref, alt) -> Column:
    return is_insertion(ref, alt) | is_deletion(ref, alt)


def is_star(ref, alt) -> Column:
    return _c(alt) == "*"


def is_complex(ref, alt) -> Column:
    r, a = _c(ref), _c(alt)
    return (
        (r != a)
        & ~is_snp(ref, alt)
        & ~is_mnp(ref, alt)
        & ~is_indel(ref, alt)
        & ~is_star(ref, alt)
    )


def is_transition(ref, alt) -> Column:
    r, a = _c(ref), _c(alt)
    pair = F.concat(r, a)
    return is_snp(ref, alt) & pair.isin("AG", "GA", "CT", "TC")


def is_transversion(ref, alt) -> Column:
    return is_snp(ref, alt) & ~is_transition(ref, alt)


def allele_type(ref, alt) -> Column:
    """Categorical allele type (ref allele_type, functions.py:3772)."""
    return (
        F.when(is_snp(ref, alt), "SNP")
        .when(is_mnp(ref, alt), "MNP")
        .when(is_insertion(ref, alt), "Insertion")
        .when(is_deletion(ref, alt), "Deletion")
        .when(is_star(ref, alt), "Star")
        .when(_c(ref) == _c(alt), "Unknown")
        .otherwise("Complex")
    )


def info_score(entries, gp_field: str = "GP") -> Column:
    """IMPUTE-style imputation info score over an entries array whose
    structs carry a genotype-probability triple ``GP`` (ref
    aggregators.py:1568 `hl.agg.info_score`; Scala
    agg/InfoScoreAggregator):

        e_i = GP[1] + 2 GP[2]            (expected dosage)
        f_i = GP[1] + 4 GP[2]
        theta = sum(e) / 2N
        info  = 1 - sum(f - e^2) / (2 N theta (1 - theta))

    info = 1 when theta is 0 or 1 (monomorphic); N counts non-missing
    GP triples.  Returns struct(score double, n_included int) — a pure
    array-HOF expression, stays in whole-stage codegen.
    """
    gps = F.filter(
        F.transform(entries, lambda x: x[gp_field]),
        lambda g: g.isNotNull() & (F.size(g) == 3),
    )
    n = F.size(gps)
    e_of = lambda g: F.element_at(g, 2) + 2.0 * F.element_at(g, 3)  # noqa: E731
    f_of = lambda g: F.element_at(g, 2) + 4.0 * F.element_at(g, 3)  # noqa: E731
    sum_e = F.aggregate(gps, F.lit(0.0), lambda a, g: a + e_of(g))
    sum_fe2 = F.aggregate(
        gps, F.lit(0.0), lambda a, g: a + (f_of(g) - e_of(g) * e_of(g))
    )
    theta = sum_e / (2.0 * n)
    score = F.when(
        (n > 0) & (theta > 0.0) & (theta < 1.0),
        1.0 - sum_fe2 / (2.0 * n * theta * (1.0 - theta)),
    ).when((n > 0), F.lit(1.0))
    return F.struct(score.alias("score"), n.alias("n_included"))


def lower_bound(arr, x) -> Column:
    """Index (0-based) of the first element >= x in a sorted array —
    ref functions.py:7107 `hl.binary_search` semantics (V:1556
    LowerBoundOnOrderedCollection).  Count-of-smaller via a filter —
    O(n) per row but stays in codegen; arrays here are per-row
    collections, not data-scale."""
    return F.size(F.filter(arr, lambda e: e < x))


def binary_search(arr, x) -> Column:
    """Alias of lower_bound (the reference exposes binary_search as the
    public name, functions.py:7107)."""
    return lower_bound(arr, x)


def keyed_intersection(a, b, key: str) -> Column:
    """Intersection of two arrays of keyed structs by key field (ref
    functions.py:5582 `hl.keyed_intersection`): elements of ``a`` whose
    key appears in ``b``, a-side values win, sorted by key."""
    bkeys = F.transform(b, lambda e: e[key])
    return F.array_sort(F.filter(a, lambda e: F.array_contains(bkeys, e[key])))


def keyed_union(a, b, key: str) -> Column:
    """Union by key (ref functions.py:5612): all of ``a`` plus elements
    of ``b`` whose key is absent from ``a``, sorted by key."""
    akeys = F.transform(a, lambda e: e[key])
    only_b = F.filter(b, lambda e: ~F.array_contains(akeys, e[key]))
    return F.array_sort(F.concat(a, only_b))


def min_rep(pos, ref, alt) -> Column:
    """Minimal representation of a variant (ref functions.py:6291
    `hl.min_rep`; Scala variant/VariantMethods minRep): trim the longest
    shared suffix (keeping >=1 base each), then the longest shared
    prefix, shifting the position right by the prefix length.  Returns
    struct(position, ref, alt).  Pure fold expressions over character
    positions — no UDF."""
    pos = pos if isinstance(pos, Column) else F.lit(pos)
    ref = ref if isinstance(ref, Column) else F.lit(ref)
    alt = alt if isinstance(alt, Column) else F.lit(alt)
    lr, la = F.length(ref), F.length(alt)
    max_suf = F.least(lr, la) - 1
    # longest common suffix length (bounded so >=1 base remains)
    suf = F.aggregate(
        F.when(max_suf >= 1, F.sequence(F.lit(1), max_suf)).otherwise(F.array().cast("array<int>")),
        F.struct(F.lit(False).alias("done"), F.lit(0).alias("k")),
        lambda acc, i: F.when(
            ~acc["done"] & (ref.substr(lr - i + 1, F.lit(1)) == alt.substr(la - i + 1, F.lit(1))),
            F.struct(F.lit(False).alias("done"), i.alias("k")),
        ).otherwise(F.struct(F.lit(True).alias("done"), acc["k"].alias("k"))),
        lambda acc: acc["k"],
    )
    r1 = ref.substr(F.lit(1), lr - suf)
    a1 = alt.substr(F.lit(1), la - suf)
    l1r, l1a = F.length(r1), F.length(a1)
    max_pre = F.least(l1r, l1a) - 1
    pre = F.aggregate(
        F.when(max_pre >= 1, F.sequence(F.lit(1), max_pre)).otherwise(F.array().cast("array<int>")),
        F.struct(F.lit(False).alias("done"), F.lit(0).alias("k")),
        lambda acc, i: F.when(
            ~acc["done"] & (r1.substr(i, F.lit(1)) == a1.substr(i, F.lit(1))),
            F.struct(F.lit(False).alias("done"), i.alias("k")),
        ).otherwise(F.struct(F.lit(True).alias("done"), acc["k"].alias("k"))),
        lambda acc: acc["k"],
    )
    return F.struct(
        (pos + pre).alias("position"),
        r1.substr(pre + 1, l1r - pre).alias("ref"),
        a1.substr(pre + 1, l1a - pre).alias("alt"),
    )


# ---------------------------------------------------------------------- #
# genotype-likelihood / allele string helpers (ref functions.py:
# gp_dosage :5792, pl_dosage :5827, pl_to_gp :5764, gq_from_pl,
# reverse_complement :6184, is_strand_ambiguous :2672, variant_str,
# parse_call, unphased_diploid_gt_index_call :2467) — all pure Column
# expressions (codegen, no UDF).
# ---------------------------------------------------------------------- #
def gp_dosage(gp) -> Column:
    """Expected n_alt dosage from genotype probabilities: GP[1]+2·GP[2]
    (biallelic diploid)."""
    g = _c(gp)
    return g[1] + 2.0 * g[2]


def pl_to_gp(pl) -> Column:
    """Phred-scaled likelihoods → normalized genotype probabilities:
    10^(-PL/10) / Σ."""
    p = F.transform(_c(pl), lambda x: F.pow(F.lit(10.0), -x.cast("double") / 10.0))
    s = F.aggregate(p, F.lit(0.0), lambda acc, x: acc + x)
    return F.transform(p, lambda x: x / s)


def pl_dosage(pl) -> Column:
    """Expected dosage from PLs (gp_dosage ∘ pl_to_gp)."""
    return gp_dosage(pl_to_gp(pl))


def gq_from_pl(pl) -> Column:
    """GQ = difference of the two smallest PL values (capped like the
    reference at 99 by callers; raw difference here)."""
    s = F.array_sort(_c(pl))
    return (s[1] - s[0]).cast("int")


def reverse_complement(s, rna: bool = False) -> Column:
    out = F.reverse(F.translate(_c(s), "ACGTacgt", "TGCAtgca"))
    if rna:
        out = F.translate(out, "Tt", "Uu")
    return out


def is_strand_ambiguous(ref, alt) -> Column:
    """True for A/T, T/A, C/G, G/C pairs (same alleles on the reverse
    strand)."""
    pair = F.concat(_c(ref), F.lit("/"), _c(alt))
    return pair.isin("A/T", "T/A", "C/G", "G/C")


def variant_str(contig, position, alleles) -> Column:
    """'contig:pos:ref:alt1,...' (hl.variant_str)."""
    return F.concat_ws(
        ":",
        _c(contig).cast("string"),
        _c(position).cast("string"),
        F.array_join(_c(alleles), ","),
    )


def parse_call(s) -> Column:
    """Parse a VCF-style call string ('0/1', '1|1', '0', '.') into
    struct(GT: n_alt int, ploidy int, phased boolean); missing ('.' or
    './.') → null struct."""
    c = _c(s)
    phased = c.contains("|")
    parts = F.split(c, r"[/|]")
    missing = F.exists(parts, lambda a: a == ".") | (F.length(c) == 0)
    n_alt = F.aggregate(
        parts, F.lit(0), lambda acc, a: acc + F.when(a != "0", 1).otherwise(0)
    )
    out = F.when(
        ~missing,
        F.struct(
            n_alt.alias("GT"),
            F.size(parts).alias("ploidy"),
            phased.alias("phased"),
        ),
    )
    out._hs_call_struct = True  # lets mendel_error_code take calls or dosages
    return out


def unphased_diploid_gt_index_call(idx) -> Column:
    """Genotype-index → allele pair for unphased diploids (triangle
    numbering: index = k(k+1)/2 + j with j <= k): struct(j, k)."""
    i = _c(idx).cast("int")
    k = F.floor((F.sqrt(8.0 * i + 1.0) - 1.0) / 2.0).cast("int")
    j = (i - k * (k + 1) / 2).cast("int")
    return F.struct(j.alias("j"), k.alias("k"))


def numeric_allele_type(ref, alt) -> Column:
    """Integer code of allele_type, matching the reference's
    AlleleType enum order (SNP=0, MNP=1, Insertion=2, Deletion=3,
    Complex=4, Star=5, Symbolic=6, Unknown=7)."""
    t = allele_type(ref, alt)
    m = F.create_map(
        F.lit("SNP"), F.lit(0), F.lit("MNP"), F.lit(1),
        F.lit("Insertion"), F.lit(2), F.lit("Deletion"), F.lit(3),
        F.lit("Complex"), F.lit(4), F.lit("Star"), F.lit(5),
        F.lit("Symbolic"), F.lit(6), F.lit("Unknown"), F.lit(7),
    )
    return F.coalesce(m[t], F.lit(7))


# ---------------------------------------------------------------------- #
# surface-closure batch (ref functions.py: expit :5839, logit :5862,
# dchisq :2454, nanmin/nanmax :4900-4950, rand_int64 :3100,
# rand_norm2d :3311, shuffle :3518, locus_interval :6643,
# parse_locus_interval :6700, starmap/delimit/repeat — thin forms of
# the same public contracts)
# ---------------------------------------------------------------------- #
def expit(x) -> Column:
    """Logistic sigmoid 1/(1+e^-x) (ref functions.py:5839)."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-_c(x)))


def logit(p) -> Column:
    """log(p/(1-p)) (ref functions.py:5862)."""
    p = _c(p)
    return F.log(p / (F.lit(1.0) - p))


def dchisq(x, df, log_p: bool = False) -> Column:
    """Chi-squared density (ref functions.py:2454): the Gamma(df/2, 2)
    pdf, via lgamma for stability."""
    x = _c(x).cast("double")
    k2 = _c(df).cast("double") / 2.0
    logp = (k2 - 1.0) * F.log(x) - x / 2.0 - k2 * F.log(F.lit(2.0)) - _lgamma_col(k2)
    return logp if log_p else F.exp(logp)


def _lgamma_col(x) -> Column:
    """log-gamma as a Column (Lanczos g=7, n=9 — textbook constants)."""
    g = [
        0.99999999999980993, 676.5203681218851, -1259.1392167224028,
        771.32342877765313, -176.61502916214059, 12.507343278686905,
        -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7,
    ]
    x = _c(x).cast("double") - 1.0
    a = F.lit(g[0])
    for i in range(1, 9):
        a = a + F.lit(g[i]) / (x + i)
    t = x + 7.5
    return (
        F.lit(0.9189385332046727)  # 0.5*log(2*pi)
        + (x + 0.5) * F.log(t)
        - t
        + F.log(a)
    )


def nanmin(a, b) -> Column:
    """Two-arg min ignoring NaN (ref functions.py:4900)."""
    a, b = _c(a), _c(b)
    return F.when(F.isnan(a), b).when(F.isnan(b), a).otherwise(F.least(a, b))


def nanmax(a, b) -> Column:
    a, b = _c(a), _c(b)
    return F.when(F.isnan(a), b).when(F.isnan(b), a).otherwise(F.greatest(a, b))


def rand_int64(uid, n=None, seed: int | None = None) -> Column:
    """Uniform int64 (ref functions.py:3100)."""
    seed = _seed(seed)
    h = F.xxhash64(_c(uid), F.lit(seed))
    return h if n is None else F.pmod(h, F.lit(n).cast("bigint"))


def rand_norm2d(uid, seed: int | None = None) -> Column:
    """2-D standard normal as array<double> (ref functions.py:3311):
    both Box-Muller outputs from one uniform pair."""
    seed = _seed(seed)
    u1 = rand_unif(uid, seed=seed * 2 + 1)
    u2 = rand_unif(uid, seed=seed * 2 + 2)
    r = F.sqrt(-2.0 * F.log(u1))
    th = 2.0 * 3.141592653589793 * u2
    return F.array(r * F.cos(th), r * F.sin(th))


def shuffle(arr, uid=None, seed: int | None = None) -> Column:
    """Deterministic pseudo-random permutation of an array (ref
    functions.py:3518 hl.shuffle): sort by a per-element hash keyed on
    the element's position and an optional row uid."""
    seed = _seed(seed)
    a = _c(arr)
    key = _c(uid) if uid is not None else F.lit("")
    idx = F.sequence(F.lit(0), F.size(a) - 1)
    tagged = F.transform(
        idx,
        lambda i: F.struct(
            F.xxhash64(key, i.cast("string"), F.lit(seed)).alias("h"), i.alias("i")
        ),
    )
    return F.transform(F.array_sort(tagged), lambda s: F.element_at(a, s["i"] + 1))


def locus_interval(contig, start, end, includes_start=True, includes_end=False) -> Column:
    """Interval of loci (ref functions.py:6643)."""
    return F.struct(
        locus(contig, start).alias("start"),
        locus(contig, end).alias("end"),
        F.lit(bool(includes_start)).alias("includes_start"),
        F.lit(bool(includes_end)).alias("includes_end"),
    )


def parse_locus_interval(s) -> Column:
    """Parse "contig:start-end" / "contig:start-contig:end" (ref
    functions.py:6700; bracket forms reduce to the default
    [start, end) here)."""
    s = _c(s)
    c1 = F.regexp_extract(s, r"^([^:]+):(\d+)-(?:([^:]+):)?(\d+)$", 1)
    p1 = F.regexp_extract(s, r"^([^:]+):(\d+)-(?:([^:]+):)?(\d+)$", 2).cast("int")
    c2r = F.regexp_extract(s, r"^([^:]+):(\d+)-(?:([^:]+):)?(\d+)$", 3)
    p2 = F.regexp_extract(s, r"^([^:]+):(\d+)-(?:([^:]+):)?(\d+)$", 4).cast("int")
    c2 = F.when(c2r == "", c1).otherwise(c2r)
    return F.struct(
        locus(c1, p1).alias("start"),
        locus(c2, p2).alias("end"),
        F.lit(True).alias("includes_start"),
        F.lit(False).alias("includes_end"),
    )


def starmap(f, arr) -> Column:
    """map over an array of tuples, splatting the ``_0.._n`` fields as
    arguments (ref functions.py starmap) — the tuple arity is read off
    f's signature."""
    import inspect

    n = len(inspect.signature(f).parameters)
    a = _c(arr)
    return F.transform(a, lambda s: f(*[s[f"_{i}"] for i in range(n)]))


def delimit(arr, delimiter: str = ",") -> Column:
    """array_join parity alias (ref functions.py delimit)."""
    return F.array_join(F.transform(_c(arr), lambda x: x.cast("string")), delimiter)


def repeat(x, n) -> Column:
    """Array of x repeated n times (ref functions.py repeat)."""
    return F.array_repeat(_c(x), _c(n) if not isinstance(n, int) else n)


# ---------------------------------------------------------------------- #
# thin constructors / aliases closing the remaining hl.* name surface
# (ref functions.py: array :1940, dict :2010, empty_* :2070-2140,
# literal :160, null/missing :471, flatten :3960, zip_with_index :4480,
# struct :1800, tuple :1880, parse_* :4050-4120)
# ---------------------------------------------------------------------- #
def array(collection) -> Column:
    """hl.array: collection → array (sets/dicts are arrays here;
    dict → entries array)."""
    c = _c(collection)
    return c


def literal(value, dtype: str | None = None) -> Column:
    c = F.lit(value)
    return c.cast(dtype) if dtype else c


null = missing  # hl.null is the deprecated spelling of hl.missing


def empty_array(dtype: str) -> Column:
    return F.array().cast(f"array<{dtype}>")


def empty_set(dtype: str) -> Column:
    return F.array().cast(f"array<{dtype}>")


def empty_dict(key_dtype: str, value_dtype: str) -> Column:
    return F.map_from_arrays(
        F.array().cast(f"array<{key_dtype}>"), F.array().cast(f"array<{value_dtype}>")
    )


def dict_(entries) -> Column:
    """hl.dict over an array of (key, value) structs."""
    return dict_from_entries(entries)


def flatten(arrs) -> Column:
    return F.flatten(_c(arrs))


def zip_with_index(arr, index_first: bool = True) -> Column:
    """Deprecated hl.zip_with_index (ref functions.py:4567) —
    enumerate with the same index-first default."""
    return enumerate_(arr, index_first=index_first)


def struct(**fields) -> Column:
    return F.struct(*[_c(v).alias(k) for k, v in fields.items()])


def tuple_(*values) -> Column:
    return F.struct(*[_c(v).alias(f"_{i}") for i, v in enumerate(values)])


def float_(x) -> Column:
    return _c(x).cast("double")


def int_(x) -> Column:
    return _c(x).cast("int")


def parse_int(s) -> Column:
    return parse_int32(s)


def parse_float(s) -> Column:
    return parse_float64(s)


def parse_float32(s) -> Column:
    return _c(s).try_cast("float")


def divide(a, b) -> Column:
    """Hail ``/`` — FLOAT division regardless of operand types (ref
    arithmetic: x / y promotes to float64): 5/0 → inf, -5/0 → -inf,
    0/0 → NaN. Spark 4's ANSI mode (this session's default) raises
    DIVIDE_BY_ZERO even for doubles, so the zero-divisor cases are
    spelled out (a -0.0 divisor maps to the +0.0 results — the one
    deliberate edge deviation)."""
    num = _c(a).cast("double")
    den = _c(b).cast("double")
    return (
        F.when(den.isNull() | num.isNull(), F.lit(None).cast("double"))
        .when(den != 0.0, num / F.when(den != 0.0, den))
        # NaN/0 is NaN — must precede the sign branches because Spark
        # orders NaN greater than every value, so `num > 0` matches NaN
        .when(F.isnan(num), F.lit(float("nan")))
        .when(num > 0, F.lit(float("inf")))
        .when(num < 0, F.lit(float("-inf")))
        .otherwise(F.lit(float("nan")))
    )


# ---------------------------------------------------------------------- #
# driver-side evaluation (ref hl.eval / eval_typed / eval_timed)
# ---------------------------------------------------------------------- #
def eval(expression) -> Any:  # noqa: A001 - reference name
    """Evaluate a constant Column expression driver-side (ref
    context.py hl.eval): one single-row local job, no table scan."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        from ..session import get_spark

        spark = get_spark()
    return spark.range(1).select(_c(expression).alias("v")).first()["v"]


def eval_typed(expression):
    """(value, spark_type) pair (ref hl.eval_typed)."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        from ..session import get_spark

        spark = get_spark()
    df = spark.range(1).select(_c(expression).alias("v"))
    return df.first()["v"], df.schema["v"].dataType


def eval_timed(expression):
    """(value, seconds) pair (ref hl.eval_timed)."""
    import time as _time

    t0 = _time.time()
    v = eval(expression)
    return v, _time.time() - t0


# ---------------------------------------------------------------------- #
# calls: construction + downcode + mendel codes
# (ref functions.py:2243 `call`, :5237 `downcode`, :6415 `mendel_error_code`)
# ---------------------------------------------------------------------- #
def call(*alleles, phased: bool = False) -> Column:
    """Construct a call from literal allele indices (ref hl.call):
    struct(GT=n_alt, ploidy, phased) — the engine's parsed-call shape
    (parse_call above)."""
    n_alt = sum(1 for a in alleles if a != 0)
    out = F.struct(
        F.lit(n_alt).alias("GT"),
        F.lit(len(alleles)).alias("ploidy"),
        F.lit(bool(phased)).alias("phased"),
    )
    out._hs_call_struct = True
    return out


def downcode(gta, i) -> Column:
    """Downcode a multiallelic call to biallelic dosage of allele ``i``
    (ref hl.downcode): alleles equal to ``i`` count as alt, everything
    else folds into ref.  Operates on the engine's allele-index-array
    call representation (GTA, io/vcf.py) and returns the biallelic GT
    dosage — the exact recode split_multi_hts applies."""
    a = _c(gta)
    ii = _c(i)
    return F.when(
        a.isNotNull(),
        F.aggregate(a, F.lit(0), lambda acc, al: acc + F.when(al == ii, 1).otherwise(0)),
    )


def _gt_of(c) -> Column:
    """Dosage from either a bare GT int column or a :func:`call` /
    :func:`parse_call` struct (Columns are typeless until analysis, so
    struct-ness rides on a builder-set marker attribute)."""
    col_ = _c(c)
    # NB: Column.__getattr__ turns unknown attrs into field accesses, so
    # probe the instance dict, not getattr
    if col_.__dict__.get("_hs_call_struct", False):
        return col_["GT"]
    return col_


def mendel_error_code(locus, is_female, father, mother, child) -> Column:
    """Mendel-violation code 1-12 (ref functions.py:6415, table in its
    docstring); null when consistent or uncallable.  Copy state: Auto =
    autosomal contig or female child on X; HemiX/HemiY = male child on
    X/Y.  PAR intervals are not modeled (documented divergence: PAR
    loci on X report as HemiX for male children)."""
    d, m, k = _gt_of(father), _gt_of(mother), _gt_of(child)
    fem = _c(is_female)
    contig = _c(locus)["contig"]
    on_x = contig.isin("X", "chrX")
    on_y = contig.isin("Y", "chrY")
    auto = (~on_x & ~on_y) | (on_x & fem)
    hemi_x = on_x & ~fem
    hemi_y = on_y & ~fem
    hom_ref, het, hom_var = (lambda g: g == 0), (lambda g: g == 1), (lambda g: g == 2)
    # the reference's `~State` complements within {HomRef,Het,HomVar,NoCall},
    # so a no-call (null) parent IS in every complement set
    nhom_ref = lambda g: g.isNull() | (g != 0)  # noqa: E731
    nhom_var = lambda g: g.isNull() | (g != 2)  # noqa: E731
    return (
        F.when(auto & hom_var(d) & hom_var(m) & het(k), 1)
        .when(auto & hom_ref(d) & hom_ref(m) & het(k), 2)
        .when(auto & hom_ref(d) & nhom_ref(m) & hom_var(k), 3)
        .when(auto & nhom_ref(d) & hom_ref(m) & hom_var(k), 4)
        .when(auto & hom_ref(d) & hom_ref(m) & hom_var(k), 5)
        .when(auto & hom_var(d) & nhom_var(m) & hom_ref(k), 6)
        .when(auto & nhom_var(d) & hom_var(m) & hom_ref(k), 7)
        .when(auto & hom_var(d) & hom_var(m) & hom_ref(k), 8)
        .when(hemi_x & hom_var(m) & hom_ref(k), 9)
        .when(hemi_x & hom_ref(m) & hom_var(k), 10)
        .when(hemi_y & hom_var(d) & hom_ref(k), 11)
        .when(hemi_y & hom_ref(d) & hom_var(k), 12)
        .otherwise(F.lit(None).cast("int"))
    )


# ---------------------------------------------------------------------- #
# reference-genome helpers at function level (ref functions.py:6447+)
# ---------------------------------------------------------------------- #
def contig_length(contig, reference_genome: str = "default") -> Column:
    from .genome import default_reference, get_reference

    rg = default_reference() if reference_genome == "default" else get_reference(reference_genome)
    return rg.contig_length(contig)


def is_valid_contig(contig, reference_genome: str = "default") -> Column:
    from .genome import default_reference, get_reference

    rg = default_reference() if reference_genome == "default" else get_reference(reference_genome)
    return _c(contig).isin(*rg.contigs)


def is_valid_locus(contig, position, reference_genome: str = "default") -> Column:
    from .genome import default_reference, get_reference

    rg = default_reference() if reference_genome == "default" else get_reference(reference_genome)
    return rg.is_valid_locus(contig, position)


def locus_from_global_position(global_pos, reference_genome: str = "default") -> Column:
    from .genome import default_reference, get_reference

    rg = default_reference() if reference_genome == "default" else get_reference(reference_genome)
    return rg.locus_from_global_position(global_pos)


# ---------------------------------------------------------------------- #
# comparator sort + multivariate hypergeometric draw
# ---------------------------------------------------------------------- #
def _sort_by(collection, less_than) -> Column:
    """Sort by a custom comparator (ref functions.py:5687 `_sort_by`):
    F.array_sort's (-1,0,1) comparator built from the reference's
    less_than predicate."""
    return F.array_sort(
        _c(collection),
        lambda l, r: F.when(less_than(l, r), -1).when(less_than(r, l), 1).otherwise(0),
    )


def rand_multi_hyper(uid, colors, nsample, seed: int | None = None) -> Column:
    """Multivariate hypergeometric draw (ref functions.py:3486
    ``hl.rand_multi_hyper``), decomposed into sequential marginal
    hypergeometric draws — color i is hypergeometric over (successes =
    colors[i], failures = sum(colors[i+1:]), draws = what's left) —
    which is the exact conditional factorization of the joint law.
    Takes the engine's per-row ``uid`` column first like the rest of
    the seeded rand_* family."""
    cols = list(colors)
    draws = []
    left = _c(nsample)
    for j, cj in enumerate(cols):
        if j == len(cols) - 1:
            draws.append(left)
            break
        rest_sum = _c(0)
        for r in cols[j + 1 :]:
            rest_sum = rest_sum + _c(r)
        d = rand_hyper(
            uid, _c(cj), rest_sum, left, seed=None if seed is None else seed + j
        )
        d = F.least(F.greatest(d.cast("int"), F.lit(0)), left)
        draws.append(d)
        left = left - d
    return F.array(*draws)


# ---------------------------------------------------------------------- #
# reference-name access layer
# ---------------------------------------------------------------------- #
# The reference exports builtin-shadowing names (hl.len, hl.map, hl.zip,
# hl.range, ...). This module implements them with a trailing underscore
# so the Python builtins stay usable inside function bodies; PEP 562
# module __getattr__ serves the bare reference spelling on attribute
# access (hf.len resolves here, a bare `len(...)` inside this module
# still hits the builtin).
_REFERENCE_NAME_ALIASES = {
    "map": "map_",
    "filter": "filter_",
    "zip": "zip_",
    "enumerate": "enumerate_",
    "sorted": "sorted_",
    "reversed": "reversed_",
    "len": "len_",
    "range": "range_",
    "median": "median_",
    "any": "any_",
    "all": "all_",
    "sum": "sum_",
    "mean": "mean_",
    "product": "product_",
    "min": "nanmin",
    "max": "nanmax",
    "bool": "bool_",
    "str": "str_",
    "int": "int_",
    "float": "float_",
    "dict": "dict_",
    "set": "set_",
    "tuple": "tuple_",
    "format": "format",
}

_LAZY_REEXPORTS = {
    # point/interval reads without a Spark job (io/query_table.py)
    "query_table": ("hail_spark.io.query_table", "query_table"),
    "query_matrix_table_rows": ("hail_spark.io.query_table", "query_matrix_table_rows"),
    # type-system surface (expr/types.py) reachable as hf.tint32 etc.,
    # matching `from hail.expr.types import *` in the reference's expr
    # __init__
    "dtype": ("hail_spark.expr.types", "dtype"),
    "HailType": ("hail_spark.expr.types", "HailType"),
    "hail_type": ("hail_spark.expr.types", "hail_type"),
    "impute_type": ("hail_spark.expr.types", "impute_type"),
    "hts_entry_schema": ("hail_spark.expr.types", "hts_entry_schema"),
    **{
        n: ("hail_spark.expr.types", n)
        for n in (
            "tvoid tbool tint32 tint64 tfloat32 tfloat64 tstr tbinary tint tfloat "
            "tcall tlocus tarray tstream tset tdict tstruct ttuple tinterval "
            "tndarray is_numeric is_primitive is_container is_compound types_match"
        ).split()
    },
}


def __getattr__(name: str):
    if name in _REFERENCE_NAME_ALIASES:
        return globals()[_REFERENCE_NAME_ALIASES[name]]
    if name in _LAZY_REEXPORTS:
        import importlib

        mod_name, attr = _LAZY_REEXPORTS[name]
        return getattr(importlib.import_module(mod_name), attr)
    raise AttributeError(f"module 'hail_spark.expr.functions' has no attribute '{name}'")
