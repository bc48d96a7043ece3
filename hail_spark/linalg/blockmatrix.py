"""BlockMatrix — distributed dense matrix in block-grid layout.

Parity target: Hail's ``BlockMatrix`` (ref hail/hail/src/is/hail/linalg/
BlockMatrix.scala, 2600 LoC; GridPartitioner.scala; Python
hail/python/hail/linalg/blockmatrix.py). Representation here: a
DataFrame with one row per (block_row, block_col) carrying the dense
block as ``data: array<double>`` (row-major) + block dims — the grid
partitioning is Spark hash partitioning on (bi, bj).

Strategy split:
* structural ops (transpose, elementwise arithmetic, scalar map,
  row/col sums, to-long) — pure Spark array HOFs, whole-stage codegen;
* multiply — the one genuinely numeric kernel: block pairs join on the
  inner index, numpy gemm per pair inside ``applyInPandas`` (Arrow
  batches; the same BLAS the reference calls via LAPACK.scala), partial
  products summed per output block.

At scale the multiply shuffles A once and B once (hash on the join
key), then one aggregation shuffle for the partial sums — matching the
communication pattern of the reference's tree_matmul.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SCHEMA = "bi bigint, bj bigint, r int, c int, data array<double>"


class BlockMatrix:
    def __init__(self, df: DataFrame, n_rows: int, n_cols: int, block_size: int):
        self.df = df  # columns: bi, bj, r, c, data (row-major)
        self.n_rows = n_rows
        self.n_cols = n_cols
        self.block_size = block_size

    # ------------------------------------------------------------------ #
    # construction
    # ------------------------------------------------------------------ #
    @classmethod
    def from_long(
        cls,
        df: DataFrame,
        n_rows: int,
        n_cols: int,
        block_size: int = 1024,
        i: str = "i",
        j: str = "j",
        v: str = "v",
    ) -> "BlockMatrix":
        """Build from a long (i, j, value) DataFrame; absent cells = 0
        (ref BlockMatrix.from_entry_expr, blockmatrix.py)."""
        bs = block_size
        blocks = (
            df.select(
                (F.col(i) / bs).cast("bigint").alias("bi"),
                (F.col(j) / bs).cast("bigint").alias("bj"),
                (F.col(i) % bs).alias("li"),
                (F.col(j) % bs).alias("lj"),
                F.col(v).cast("double").alias("v"),
            )
            .groupBy("bi", "bj")
            .agg(F.collect_list(F.struct("li", "lj", "v")).alias("cells"))
        )

        def fill(bi, bj, cells_list):
            r = min(bs, n_rows - bi * bs)
            c = min(bs, n_cols - bj * bs)
            return r, c

        r_of = F.least(F.lit(bs), F.lit(n_rows) - F.col("bi") * bs).cast("int")
        c_of = F.least(F.lit(bs), F.lit(n_cols) - F.col("bj") * bs).cast("int")
        dense = blocks.select(
            "bi",
            "bj",
            r_of.alias("r"),
            c_of.alias("c"),
            F.transform(
                F.sequence(F.lit(0), (r_of * c_of - 1).cast("int")),
                lambda idx: F.coalesce(
                    F.element_at(
                        F.map_from_entries(
                            F.transform(
                                F.col("cells"),
                                lambda s: F.struct(
                                    (s["li"] * c_of + s["lj"]).cast("int").alias("k"),
                                    s["v"].alias("v"),
                                ),
                            )
                        ),
                        idx.cast("int"),
                    ),
                    F.lit(0.0),
                ),
            ).alias("data"),
        ).drop("cells")
        return cls(dense, n_rows, n_cols, bs)

    # ------------------------------------------------------------------ #
    # structural ops (pure Spark)
    # ------------------------------------------------------------------ #
    def _zip_elementwise(self, other: "BlockMatrix", fn) -> "BlockMatrix":
        a = self.df.select("bi", "bj", "r", "c", F.col("data").alias("da"))
        b = other.df.select("bi", "bj", F.col("data").alias("db"))
        out = a.join(b, on=["bi", "bj"], how="inner").select(
            "bi", "bj", "r", "c", F.zip_with("da", "db", fn).alias("data")
        )
        return BlockMatrix(out, self.n_rows, self.n_cols, self.block_size)

    def add(self, other: "BlockMatrix") -> "BlockMatrix":
        return self._zip_elementwise(other, lambda x, y: x + y)

    def sub(self, other: "BlockMatrix") -> "BlockMatrix":
        return self._zip_elementwise(other, lambda x, y: x - y)

    def mul(self, other: "BlockMatrix") -> "BlockMatrix":
        """Hadamard product (ref BlockMatrix.mul :816)."""
        return self._zip_elementwise(other, lambda x, y: x * y)

    def map(self, fn) -> "BlockMatrix":
        """Elementwise scalar map (sqrt/pow/log/abs family :933-947)."""
        out = self.df.withColumn("data", F.transform("data", fn))
        return BlockMatrix(out, self.n_rows, self.n_cols, self.block_size)

    def scalar_mul(self, s: float) -> "BlockMatrix":
        return self.map(lambda x: x * s)

    def transpose(self) -> "BlockMatrix":
        """(ref BlockMatrix.transpose :961) — swap grid coords and
        permute each block in place (array HOF, no shuffle beyond the
        implicit repartition of downstream ops)."""
        # two steps: permute first (against the ORIGINAL r/c), then swap
        # names — a single select would resolve r/c against the aliases
        permuted = self.df.select(
            "bi",
            "bj",
            "r",
            "c",
            F.transform(
                F.sequence(F.lit(0), F.col("r") * F.col("c") - 1),
                lambda idx: F.element_at(
                    "data",
                    ((idx % F.col("r")) * F.col("c") + F.floor(idx / F.col("r")) + 1).cast(
                        "int"
                    ),
                ),
            ).alias("tdata"),
        )
        out = permuted.select(
            F.col("bj").alias("bi"),
            F.col("bi").alias("bj"),
            F.col("c").alias("r"),
            F.col("r").alias("c"),
            F.col("tdata").alias("data"),
        )
        return BlockMatrix(out, self.n_cols, self.n_rows, self.block_size)

    def matmul(self, other: "BlockMatrix") -> "BlockMatrix":
        """C = A @ B (ref BlockMatrix.dot :950).

        Join A(bi, bk) with B(bk, bj) on the inner block index, numpy
        gemm per pair (Arrow-batched pandas UDF), sum partial blocks per
        (bi, bj). Two hash shuffles + one agg shuffle — same pattern as
        the reference's distributed multiply."""
        if self.n_cols != other.n_rows:
            raise ValueError("dimension mismatch")
        a = self.df.select(
            F.col("bi"), F.col("bj").alias("bk"), F.col("r").alias("ar"),
            F.col("c").alias("ac"), F.col("data").alias("da"),
        )
        b = other.df.select(
            F.col("bi").alias("bk"), F.col("bj"), F.col("r").alias("br"),
            F.col("c").alias("bc"), F.col("data").alias("db"),
        )
        joined = a.join(b, on="bk")

        def gemm_sum(pdf: pd.DataFrame) -> pd.DataFrame:
            bi = pdf["bi"].iloc[0]
            bj = pdf["bj"].iloc[0]
            r = int(pdf["ar"].iloc[0])
            c = int(pdf["bc"].iloc[0])
            acc = np.zeros((r, c))
            for _, row in pdf.iterrows():
                A = np.asarray(row["da"]).reshape(int(row["ar"]), int(row["ac"]))
                B = np.asarray(row["db"]).reshape(int(row["br"]), int(row["bc"]))
                acc += A @ B
            return pd.DataFrame(
                [{"bi": bi, "bj": bj, "r": r, "c": c, "data": acc.ravel().tolist()}]
            )

        out = joined.groupBy("bi", "bj").applyInPandas(gemm_sum, schema=_SCHEMA)
        return BlockMatrix(out, self.n_rows, other.n_cols, self.block_size)

    # ------------------------------------------------------------------ #
    # reductions / export
    # ------------------------------------------------------------------ #
    def to_long(self) -> DataFrame:
        """(i, j, v) long form (ref entriesTable :1555)."""
        bs = self.block_size
        return self.df.select(
            "bi", "bj", "r", "c", F.posexplode("data").alias("idx", "v")
        ).select(
            (F.col("bi") * bs + F.floor(F.col("idx") / F.col("c"))).alias("i"),
            (F.col("bj") * bs + F.col("idx") % F.col("c")).alias("j"),
            "v",
        )

    def row_sums(self) -> DataFrame:
        """Σ_j — per-block row sums then groupBy global row."""
        bs = self.block_size
        per_block = self.df.select(
            "bi", "r", "c", F.posexplode("data").alias("idx", "v")
        ).select(
            (F.col("bi") * bs + F.floor(F.col("idx") / F.col("c"))).alias("i"), "v"
        )
        return per_block.groupBy("i").agg(F.sum("v").alias("row_sum"))

    def diagonal(self) -> DataFrame:
        return self.to_long().filter(F.col("i") == F.col("j")).select("i", "v")

    def sum(self) -> float:
        return self.df.select(
            F.sum(F.aggregate("data", F.lit(0.0), lambda a, x: a + x)).alias("s")
        ).collect()[0]["s"]

    def to_numpy(self) -> np.ndarray:
        """Collect to a driver-side dense ndarray (small matrices)."""
        out = np.zeros((self.n_rows, self.n_cols))
        for row in self.df.collect():
            r, c = row["r"], row["c"]
            blk = np.asarray(row["data"]).reshape(r, c)
            i0, j0 = row["bi"] * self.block_size, row["bj"] * self.block_size
            out[i0 : i0 + r, j0 : j0 + c] = blk
        return out
