"""KLL quantile sketch — the reference's approx_cdf aggregator.

Parity target: ``hl.agg.approx_cdf`` / ApproxCDFAggregator
(hail/hail/src/is/hail/expr/ir/agg/ApproxCDFAggregator.scala,
Karnin-Lang-Liberty 2016). The expression-level ``agg.approx_cdf``
(expr/aggregators.py) reconstructs the result struct from GK
percentile_approx; THIS module is the real mergeable-sketch path for
when GK's per-group accuracy/space trade-off isn't wanted:
one ``mapInPandas`` pass builds a KLL sketch per partition (numpy,
vectorized bulk updates), the per-partition sketches (each
O(k·log(n/k)) floats) collect to the driver, and a driver-side merge —
the same partial-aggregate/combine split the reference's staged
aggregators use — yields the {values, ranks, n} result.

The compactor uses the deterministic alternating-offset variant
(Karnin et al. §2.2 remark): identical results across retries and
partition counts given the same per-partition data order, which is the
engine-wide determinism contract (threefry-free).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame


class KLLSketch:
    """Mergeable KLL sketch over float64 values.

    ``k`` bounds the top-level compactor; level h below the top holds
    at most ``max(2, ceil(k * (2/3)**depth))`` items. Total space is
    O(k / (1 - 2/3)) = 3k values regardless of n.
    """

    _C = 2.0 / 3.0

    def __init__(self, k: int = 200):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0)]
        self.n = 0
        self.min = np.inf
        self.max = -np.inf
        self._flips: list[bool] = [False]

    # ---------------------------------------------------------- #
    def _capacity(self, h: int) -> int:
        depth = len(self.levels) - 1 - h
        return max(2, int(np.ceil(self.k * (self._C**depth))))

    def update(self, vals) -> "KLLSketch":
        vals = np.asarray(vals, dtype=float)
        vals = vals[~np.isnan(vals)]
        if vals.size == 0:
            return self
        self.n += int(vals.size)
        self.min = min(self.min, float(vals.min()))
        self.max = max(self.max, float(vals.max()))
        self.levels[0] = np.concatenate([self.levels[0], vals])
        self._compress()
        return self

    def _compress(self) -> None:
        h = 0
        while h < len(self.levels):
            if self.levels[h].size <= self._capacity(h):
                h += 1
                continue
            if h + 1 == len(self.levels):
                self.levels.append(np.empty(0))
                self._flips.append(False)
            buf = np.sort(self.levels[h])
            # deterministic alternating offset instead of a coin flip
            off = 1 if self._flips[h] else 0
            self._flips[h] = not self._flips[h]
            promoted = buf[off::2]
            self.levels[h] = np.empty(0)
            self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])
            h += 1

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        if other.n == 0:
            return self
        self.n += other.n
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0))
            self._flips.append(False)
        for h, lv in enumerate(other.levels):
            if lv.size:
                self.levels[h] = np.concatenate([self.levels[h], lv])
        self._compress()
        return self

    # ---------------------------------------------------------- #
    def items_and_weights(self) -> tuple[np.ndarray, np.ndarray]:
        vs, ws = [], []
        for h, lv in enumerate(self.levels):
            if lv.size:
                vs.append(lv)
                ws.append(np.full(lv.size, 2**h, dtype=np.int64))
        if not vs:
            return np.empty(0), np.empty(0, dtype=np.int64)
        v = np.concatenate(vs)
        w = np.concatenate(ws)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def cdf(self) -> dict:
        """The reference's result struct: sorted ``values`` with
        ``ranks[i]`` ≈ #elements < values[i], ranks[-1] == n."""
        v, w = self.items_and_weights()
        if v.size == 0:
            return {"values": [], "ranks": [0], "n": 0}
        ranks = np.concatenate([[0], np.cumsum(w)])
        ranks[-1] = self.n  # exact by construction (weights sum to n)
        return {
            "values": [float(x) for x in v],
            "ranks": [int(r) for r in ranks],
            "n": self.n,
        }

    def quantile(self, q: float) -> float:
        v, w = self.items_and_weights()
        if v.size == 0:
            return float("nan")
        if q <= 0.0:
            return self.min
        if q >= 1.0:
            return self.max
        target = q * self.n
        cum = np.cumsum(w)
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(v[min(idx, v.size - 1)])

    # ---------------------------------------------------------- #
    def to_rows(self) -> list[tuple[int, list[float]]]:
        return [(h, [float(x) for x in lv]) for h, lv in enumerate(self.levels)] + [
            (-1, [float(self.n), self.min, self.max])
        ]

    @classmethod
    def from_rows(cls, rows, k: int = 200) -> "KLLSketch":
        sk = cls(k)
        meta = None
        levels: dict[int, np.ndarray] = {}
        for h, arr in rows:
            if h == -1:
                meta = arr
            else:
                levels[h] = np.asarray(arr, dtype=float)
        top = max(levels) if levels else 0
        sk.levels = [levels.get(h, np.empty(0)) for h in range(top + 1)]
        sk._flips = [False] * (top + 1)
        if meta is not None:
            sk.n = int(meta[0])
            sk.min = meta[1]
            sk.max = meta[2]
        return sk


def kll_sketch(df: DataFrame, col: str, k: int = 200) -> KLLSketch:
    """Distributed KLL sketch over one column: sketch per partition on
    the executors, merge on the driver (bytes moved =
    #partitions × O(k·log n) floats — never the data)."""
    import pandas as pd

    def build(batches):
        sk = KLLSketch(k)
        for pdf in batches:
            sk.update(pdf[col].to_numpy(dtype=float, na_value=np.nan))
        rows = sk.to_rows()
        yield pd.DataFrame({"h": [r[0] for r in rows], "vals": [r[1] for r in rows]})

    parts = df.select(col).mapInPandas(build, schema="h int, vals array<double>")
    merged = KLLSketch(k)
    # rows stream in partition order, each partition's sketch delimited
    # by its h == -1 meta row; merge is associative so order is moot
    cur: list = []
    for row in parts.collect():
        cur.append((row["h"], row["vals"]))
        if row["h"] == -1:
            merged.merge(KLLSketch.from_rows(cur, k))
            cur = []
    return merged


def approx_cdf_kll(df: DataFrame, col: str, k: int = 200) -> dict:
    """The reference's approx_cdf result struct from :func:`kll_sketch`."""
    return kll_sketch(df, col, k).cdf()
