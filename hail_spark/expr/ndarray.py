"""NDArray expressions — the ``hl.nd.*`` surface (ref
hail/python/hail/nd/nd.py:29-773; IR nodes MakeNDArray/NDArrayMap/
NDArrayReshape/NDArrayMatMul/QR/SVD/Eigh/Inv at ir.py V:862-1272,
emitted via LAPACK in the reference, hail/hail/src/is/hail/linalg/
LAPACK.scala).

Representation (SURVEY.md §1.2): ``struct<shape: array<bigint>,
data: array<double>>`` row-major.

Strategy split:
* structural ops (arange/full/map/map2/reshape/ref/transpose2d/
  concat/sum) — pure Catalyst array HOFs: whole-stage codegen, no
  Python;
* numeric kernels (matmul/inv/solve/qr/svd/eigh) — Arrow-batched
  pandas UDFs over numpy (the same LAPACK the reference links);
  one Python crossing per batch of rows, not per value.
"""

from __future__ import annotations

from functools import reduce
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

ND_TYPE = "struct<shape: array<bigint>, data: array<double>>"


def _c(x):
    return x if isinstance(x, Column) else F.lit(x)


def _nd(x) -> Column:
    """Accept a Column or a column name."""
    return F.col(x) if isinstance(x, str) else x


def make(shape: Column | list, data: Column) -> Column:
    shape_col = (
        F.array(*[_c(s).cast("bigint") for s in shape])
        if isinstance(shape, (list, tuple))
        else shape
    )
    return F.struct(shape_col.alias("shape"), data.alias("data"))


def from_array(arr: Column) -> Column:
    """1-D ndarray from an array column (hl.nd.array, nd.py:29)."""
    return make([F.size(arr).cast("bigint")], F.transform(arr, lambda x: x.cast("double")))


def arange(start, stop=None, step: int = 1) -> Column:
    """hl.nd.arange (nd.py:121)."""
    if stop is None:
        start, stop = 0, start
    seq = F.sequence(_c(start), _c(stop) - 1, _c(step)) if step > 0 else F.sequence(
        _c(start), _c(stop) + 1, _c(step)
    )
    return from_array(seq)


def full(shape: list, value) -> Column:
    n = 1
    for s in shape:
        n *= s
    return make(shape, F.array_repeat(_c(value).cast("double"), n))


def zeros(shape: list) -> Column:
    return full(shape, 0.0)


def ones(shape: list) -> Column:
    return full(shape, 1.0)


def eye(n: int, m: int | None = None) -> Column:
    """hl.nd.eye (ref nd/nd.py:550): 2-D with ones on the main
    diagonal — pure array expression (data[i] = 1 where i//m == i%m)."""
    m = n if m is None else m
    data = F.transform(
        F.sequence(F.lit(0), F.lit(n * m - 1)),
        lambda i: F.when((i - (i % m)) / m == i % m, F.lit(1.0)).otherwise(F.lit(0.0)),
    )
    return make([n, m], data)


def diagonal(nd: Column) -> Column:
    """hl.nd.diagonal (ref nd/nd.py:219): 1-D diagonal of a 2-D
    ndarray, length min(M, N) — row-major gather data[i*(N+1)]."""
    nd = _nd(nd)
    r = F.element_at(nd["shape"], 1)
    c = F.element_at(nd["shape"], 2)
    k = F.least(r, c)
    data = F.transform(
        F.sequence(F.lit(0).cast("bigint"), k - 1),
        lambda i: F.element_at(nd["data"], (i * (c + 1) + 1).cast("int")),
    )
    return F.struct(F.array(k).alias("shape"), data.alias("data"))


def maximum(a: Column, b: Column) -> Column:
    """hl.nd.maximum (ref nd/nd.py:730): elementwise max; NaN at either
    index propagates (Spark's greatest would also pick NaN since NaN
    orders above everything, but the explicit branch documents it)."""
    nan = F.lit(float("nan"))
    return ndmap2(
        a,
        b,
        lambda x, y: F.when(F.isnan(x) | F.isnan(y), nan).otherwise(F.greatest(x, y)),
    )


def minimum(a: Column, b: Column) -> Column:
    """hl.nd.minimum (ref nd/nd.py:773): elementwise min; NaN at either
    index propagates (unlike Spark's least, which would skip NaN)."""
    nan = F.lit(float("nan"))
    return ndmap2(
        a,
        b,
        lambda x, y: F.when(F.isnan(x) | F.isnan(y), nan).otherwise(F.least(x, y)),
    )


def ndmap(nd: Column, f: Callable[[Column], Column]) -> Column:
    """NDArrayMap (V:905): elementwise, shape-preserving."""
    nd = _nd(nd)
    return F.struct(
        nd["shape"].alias("shape"), F.transform(nd["data"], f).alias("data")
    )


def ndmap2(a: Column, b: Column, f: Callable[[Column, Column], Column]) -> Column:
    """NDArrayMap2 (V:921): elementwise on equal-shape operands."""
    a = _nd(a)
    b = _nd(b)
    return F.struct(
        a["shape"].alias("shape"), F.zip_with(a["data"], b["data"], f).alias("data")
    )


def reshape(nd: Column, new_shape: list) -> Column:
    """NDArrayReshape (V:1002) — metadata-only (row-major invariant)."""
    nd = _nd(nd)
    return make(new_shape, nd["data"])


def ref(nd: Column, *idx) -> Column:
    """NDArrayRef (V:958): element at a multi-index (row-major strides)."""
    nd = _nd(nd)
    shape = nd["shape"]
    flat = F.lit(0).cast("bigint")
    ndim = len(idx)
    for d, i in enumerate(idx):
        stride = F.lit(1).cast("bigint")
        for d2 in range(d + 1, ndim):
            stride = stride * F.element_at(shape, d2 + 1)
        flat = flat + _c(i).cast("bigint") * stride
    return F.element_at(nd["data"], (flat + 1).cast("int"))


def transpose2d(nd: Column) -> Column:
    """2-D transpose as a pure array HOF (no Python)."""
    nd = _nd(nd)
    r = F.element_at(nd["shape"], 1)
    c = F.element_at(nd["shape"], 2)
    permuted = F.transform(
        F.sequence(F.lit(0).cast("bigint"), r * c - 1),
        lambda i: F.element_at(
            nd["data"], ((i % r) * c + F.floor(i / r) + 1).cast("int")
        ),
    )
    return F.struct(F.array(c, r).alias("shape"), permuted.alias("data"))


def concat(nds: list[Column]) -> Column:
    """NDArrayConcat (V:1240) along axis 0 (row-major ⇒ data concat)."""
    nds = [_nd(x) for x in nds]
    first = nds[0]
    total0 = F.element_at(first["shape"], 1)
    for nd in nds[1:]:
        total0 = total0 + F.element_at(nd["shape"], 1)
    rest = F.slice(first["shape"], 2, 10)
    return F.struct(
        F.concat(F.array(total0), rest).alias("shape"),
        F.concat(*[nd["data"] for nd in nds]).alias("data"),
    )


def ndsum(nd: Column) -> Column:
    """NDArrayAgg total sum (V:1272)."""
    nd = _nd(nd)
    return F.aggregate(nd["data"], F.lit(0.0), lambda a, x: a + x)


def row_sums(nd: Column) -> Column:
    """2-D row sums → 1-D ndarray, pure HOFs."""
    nd = _nd(nd)
    r = F.element_at(nd["shape"], 1)
    c = F.element_at(nd["shape"], 2)
    sums = F.transform(
        F.sequence(F.lit(0).cast("bigint"), r - 1),
        lambda i: F.aggregate(
            F.slice(nd["data"], (i * c + 1).cast("int"), c.cast("int")),
            F.lit(0.0),
            lambda a, x: a + x,
        ),
    )
    return F.struct(F.array(r).alias("shape"), sums.alias("data"))


# ---------------------------------------------------------------------- #
# numpy kernels (pandas UDFs) — matmul / inv / solve / qr / svd / eigh
# ---------------------------------------------------------------------- #
def _nd_kernel(fn):
    """pandas_udf over struct columns: struct inputs arrive as pandas
    DataFrames (one column per field) and struct outputs must be
    returned as DataFrames. LinAlgError → sentinel empty shape, turned
    into a true NULL by the `_nullable` wrapper."""

    @pandas_udf(ND_TYPE)
    def u(*cols: pd.DataFrame) -> pd.DataFrame:
        ins = [list(zip(c["shape"], c["data"])) for c in cols]
        shapes, datas = [], []
        for rows in zip(*ins):
            try:
                args = [
                    np.asarray(d, dtype=float).reshape([int(s) for s in sh])
                    for sh, d in rows
                ]
                r = fn(*args)
                shapes.append([int(s) for s in r.shape])
                datas.append(r.ravel().tolist())
            except np.linalg.LinAlgError:
                shapes.append([])
                datas.append([])
        return pd.DataFrame({"shape": shapes, "data": datas})

    def call(*args):
        out = u(*[_nd(a) for a in args])
        return F.when(F.size(out["shape"]) > 0, out)

    return call


def matmul(a: Column, b: Column) -> Column:
    """NDArrayMatMul (V:1185) — numpy gemm per row pair."""
    return _nd_kernel(lambda x, y: x @ y)(a, b)


def inv(a: Column) -> Column:
    """hl.nd.inv (nd.py:610)."""
    return _nd_kernel(np.linalg.inv)(a)


def solve(a: Column, b: Column) -> Column:
    """hl.nd.solve (nd.py:458)."""
    return _nd_kernel(np.linalg.solve)(a, b)


def qr_r(a: Column) -> Column:
    """R factor of QR (hl.nd.qr mode='r', nd.py:517); sign-normalized
    (positive diagonal) for cross-library determinism."""

    def f(x):
        r = np.linalg.qr(x, mode="r")
        sign = np.sign(np.diag(r))
        sign[sign == 0] = 1.0
        return r * sign[:, None]

    return _nd_kernel(f)(a)


def svd_singular_values(a: Column) -> Column:
    """Singular values (hl.nd.svd, nd.py:545; compute_uv=False path)."""

    def f(x):
        return np.linalg.svd(x, compute_uv=False)

    return _nd_kernel(f)(a)


def eigh_vals(a: Column) -> Column:
    """Eigenvalues of a symmetric matrix (hl.nd.eigh, nd.py:580)."""

    def f(x):
        return np.linalg.eigvalsh(x)

    return _nd_kernel(f)(a)


# ---------------------------------------------------------------------- #
# stacking (pure Column ops — no UDF) + factorizations with vectors
# ---------------------------------------------------------------------- #
def vstack(nds: list[Column]) -> Column:
    """Row-wise stack of 2-D ndarrays (hl.nd.vstack nd.py:109). Shapes
    must share n_cols; data concatenation is exact row-major append."""
    nds = [_nd(x) for x in nds]
    rows = reduce(lambda a, b: a + b, [x["shape"][0] for x in nds])
    return F.struct(
        F.array(rows, nds[0]["shape"][1]).alias("shape"),
        F.concat(*[x["data"] for x in nds]).alias("data"),
    )


def hstack(nds: list[Column]) -> Column:
    """Column-wise stack of 2-D ndarrays (hl.nd.hstack nd.py:74):
    for each row index, take that row's slice from every input."""
    nds = [_nd(x) for x in nds]
    r = nds[0]["shape"][0]
    cols = [x["shape"][1] for x in nds]
    total_c = reduce(lambda a, b: a + b, cols)
    row_slices = F.transform(
        F.sequence(F.lit(0), (r - 1).cast("int")),
        lambda i: F.concat(
            *[
                F.slice(x["data"], (i * c + 1).cast("int"), c.cast("int"))
                for x, c in zip(nds, cols)
            ]
        ),
    )
    return F.struct(
        F.array(r, total_c).alias("shape"), F.flatten(row_slices).alias("data")
    )


def _nd_multi_kernel(fn, n_out: int):
    """Kernel returning several ndarrays as struct{out0..out{n-1}}."""
    t = ", ".join(f"out{i}: {ND_TYPE}" for i in range(n_out))

    @pandas_udf(f"struct<{t}>")
    def u(*cols: pd.DataFrame) -> pd.DataFrame:
        ins = [list(zip(c["shape"], c["data"])) for c in cols]
        outs: list[list] = [[] for _ in range(n_out)]
        for rows in zip(*ins):
            try:
                args = [
                    np.asarray(d, dtype=float).reshape([int(s) for s in sh])
                    for sh, d in rows
                ]
                rs = fn(*args)
                for i, r in enumerate(rs):
                    outs[i].append(
                        {"shape": [int(s) for s in r.shape], "data": r.ravel().tolist()}
                    )
            except np.linalg.LinAlgError:
                for i in range(n_out):
                    outs[i].append(None)
        return pd.DataFrame({f"out{i}": outs[i] for i in range(n_out)})

    return lambda *args: u(*[_nd(a) for a in args])


def _sign_normalize_cols(m: np.ndarray) -> np.ndarray:
    """Flip column signs so the largest-|.| component is positive —
    removes the eigenvector/singular-vector sign ambiguity for
    cross-library determinism."""
    idx = np.abs(m).argmax(axis=0)
    sign = np.sign(m[idx, np.arange(m.shape[1])])
    sign[sign == 0] = 1.0
    return m * sign[None, :]


def svd(a: Column) -> Column:
    """Full SVD (hl.nd.svd nd.py:545): struct{out0: U, out1: S (1-D),
    out2: Vt}, sign-normalized."""

    def f(x):
        u_, s, vt = np.linalg.svd(x, full_matrices=False)
        # joint sign flip (U col i and Vt row i together) keeps U·S·Vt = A
        idx = np.abs(u_).argmax(axis=0)
        sign = np.sign(u_[idx, np.arange(u_.shape[1])])
        sign[sign == 0] = 1.0
        return u_ * sign[None, :], s, vt * sign[:, None]

    return _nd_multi_kernel(f, 3)(a)


def eigh(a: Column) -> Column:
    """Symmetric eigendecomposition with vectors (hl.nd.eigh
    nd.py:580): struct{out0: eigenvalues asc (1-D), out1: eigenvectors
    (columns), sign-normalized}."""

    def f(x):
        w, v = np.linalg.eigh(x)
        return w, _sign_normalize_cols(v)

    return _nd_multi_kernel(f, 2)(a)


def qr(a: Column) -> Column:
    """Full QR (hl.nd.qr nd.py:517): struct{out0: Q, out1: R},
    positive-diagonal normalized."""

    def f(x):
        q, r = np.linalg.qr(x)
        sign = np.sign(np.diag(r))
        sign[sign == 0] = 1.0
        return q * sign[None, :], r * sign[:, None]

    return _nd_multi_kernel(f, 2)(a)


def solve_triangular(a: Column, b: Column, lower: bool = False) -> Column:
    """hl.nd.solve_triangular (nd.py:480) — scipy-free back/forward
    substitution via numpy."""

    def f(x, y):
        n = x.shape[0]
        y2 = y.reshape(n, -1).astype(float)
        out = np.zeros_like(y2)
        rng = range(n) if lower else range(n - 1, -1, -1)
        for i in rng:
            acc = y2[i] - x[i] @ out
            out[i] = acc / x[i, i]
        return out.reshape(y.shape)

    return _nd_kernel(f)(a, b)


# ------------------------------------------------------------------ #
# namespace completion (ref nd/nd.py: array :29, from_column_major :66,
# identity, concatenate :491, solve_helper :322)
# ------------------------------------------------------------------ #
def array(input_array, dtype=None) -> Column:
    """hl.nd.array (ref nd.py:29): a Column of arrays → 1-D ndarray;
    a (possibly nested) Python list → literal ndarray with the inferred
    rectangular shape."""
    if isinstance(input_array, Column):
        return from_array(input_array)
    import numpy as np

    M = np.asarray(input_array, dtype=float if dtype is None else dtype)
    flat = [float(x) for x in M.ravel().tolist()]
    return make(
        [F.lit(int(s)) for s in M.shape] or [F.lit(len(flat))],
        F.array(*[F.lit(v) for v in flat]) if flat else F.array().cast("array<double>"),
    )


def from_column_major(a, shape) -> Column:
    """Column-major data + shape → ndarray (ref nd.py:66): reshape to
    the reversed shape, then transpose."""
    assert len(shape) == 2
    nd = make([shape[1], shape[0]], _c(a))
    return transpose2d(nd)


def identity(n: int) -> Column:
    """Alias of eye (ref nd.py identity)."""
    return eye(n)


def concatenate(nds: list, axis: int = 0) -> Column:
    """Join ndarrays along an axis (ref nd.py:491).  axis 0 is the
    row-major data concat; axis 1 routes through two metadata-free
    transposes."""
    if axis == 0:
        return concat(list(nds))
    if axis == 1:
        return transpose2d(concat([transpose2d(x) for x in nds]))
    raise ValueError("concatenate: axis must be 0 or 1 for 2-D ndarrays")


def solve_helper(nd_coef: Column, nd_dep: Column, nd_dep_ndim_orig: int) -> Column:
    """ref nd.py:322: 1-D dependents reshape to a column vector before
    the solve, and back after."""
    dep = nd_dep
    if nd_dep_ndim_orig == 1:
        dep = make(
            [F.element_at(_nd(nd_dep)["shape"], 1), F.lit(1).cast("bigint")],
            _nd(nd_dep)["data"],
        )
    out = solve(nd_coef, dep)
    if nd_dep_ndim_orig == 1:
        out = make([F.element_at(_nd(out)["shape"], 1)], _nd(out)["data"])
    return out
