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
