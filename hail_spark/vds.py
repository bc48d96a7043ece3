"""VariantDataset (VDS) — sparse gVCF data model: a pair of
MatrixTables (reference_data, variant_data).

Parity target: reference hail/python/hail/vds/variant_dataset.py:106-117
(the pair), vds/methods.py:21-994 (toolkit). Pure composition over the
MatrixTable layer, exactly as in the reference — no new engine support.

Model: ``variant_data`` rows are variant sites (locus, alleles,
entries). ``reference_data`` rows are reference-block starts whose
entries carry an ``END`` field: sample s is covered by block
[row.locus.position, entry.END] with reference genotype quality data.

``to_dense_mt`` (ref vds/methods.py to_dense_mt) fills each variant
site's missing entries from the covering reference block:
explode reference entries → per-sample coverage intervals →
interval-containment join against variant positions (banded equi-join
on position bins to stay shuffle-bounded) → gather back to the dense
entries array. This is the same segment-join densify the reference
lowers to, expressed as DataFrame ops.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .matrixtable import ENTRIES, MatrixTable

_BIN = 10_000  # densify join band width (positions per bin)


class VariantDataset:
    def __init__(self, reference_data: MatrixTable, variant_data: MatrixTable):
        if [c["s"] for c in reference_data._cols] != [c["s"] for c in variant_data._cols]:
            raise ValueError("reference_data and variant_data must share samples")
        self.reference_data = reference_data
        self.variant_data = variant_data

    # ------------------------------------------------------------------ #
    def n_samples(self) -> int:
        return len(self.variant_data._cols)

    def write(self, path: str, overwrite: bool = False) -> None:
        self.reference_data.write(os.path.join(path, "reference_data"), overwrite)
        self.variant_data.write(os.path.join(path, "variant_data"), overwrite)
        with open(os.path.join(path, "_vds_metadata.json"), "w") as f:
            json.dump({"name": "hail_spark.VariantDataset"}, f)

    @classmethod
    def read(cls, spark: SparkSession, path: str) -> "VariantDataset":
        return cls(
            MatrixTable.read(spark, os.path.join(path, "reference_data")),
            MatrixTable.read(spark, os.path.join(path, "variant_data")),
        )

    # ------------------------------------------------------------------ #
    def filter_chromosomes(self, *contigs: str) -> "VariantDataset":
        """ref vds/methods.py filter_chromosomes."""
        keep = list(contigs)
        return VariantDataset(
            self.reference_data._with_df(
                self.reference_data._df.filter(F.col("locus")["contig"].isin(keep))
            ),
            self.variant_data._with_df(
                self.variant_data._df.filter(F.col("locus")["contig"].isin(keep))
            ),
        )

    def filter_samples(self, samples: list[str]) -> "VariantDataset":
        """ref vds/methods.py filter_samples — column subset on both."""
        idx = [i for i, c in enumerate(self.variant_data._cols) if c["s"] in set(samples)]
        return VariantDataset(
            self.reference_data.choose_cols(idx), self.variant_data.choose_cols(idx)
        )

    def union_cols(self, other: "VariantDataset") -> "VariantDataset":
        """Sample-wise union of two VDSes with disjoint samples — the
        combiner's internal tree node (ref combiner/combine.py
        combine_variant_datasets). Full OUTER join on the row key with
        each side's missing entries null-filled, so sparse rows present
        in only one input survive. One shuffle per component, keyed by
        locus — the same merge the reference's combiner lowers to.

        Variant rows join on (locus, alleles): if the two inputs carry
        different allele sets at a locus they remain separate rows
        (each row's LA/LGT stay valid against its own alleles). Run
        ``combine_gvcfs`` over one batch when cross-batch allele
        unification matters — its single-scan merge unifies alleles."""
        a_s = {c["s"] for c in self.variant_data._cols}
        b_s = {c["s"] for c in other.variant_data._cols}
        if a_s & b_s:
            raise ValueError(f"overlapping samples: {sorted(a_s & b_s)}")

        def outer_concat(l: MatrixTable, r: MatrixTable, key: list[str]) -> MatrixTable:
            nl, nr = len(l._cols), len(r._cols)
            lt = l._df.withColumnRenamed(ENTRIES, "__el")
            rt = r._df.withColumnRenamed(ENTRIES, "__er")
            lnull = F.array_repeat(
                F.lit(None).cast(l._df.schema[ENTRIES].dataType.elementType), nl
            )
            rnull = F.array_repeat(
                F.lit(None).cast(r._df.schema[ENTRIES].dataType.elementType), nr
            )
            non_key_l = [c for c in lt.columns if c not in key and c != "__el"]
            joined = lt.join(rt, on=key, how="full_outer")
            # row fields present on only one side coalesce across sides
            sel = [F.col(k) for k in key]
            for c in non_key_l:
                if c in rt.columns:
                    sel.append(F.coalesce(lt[c], rt[c]).alias(c))
                else:
                    sel.append(F.col(c))
            sel.append(
                F.concat(
                    F.coalesce(F.col("__el"), lnull), F.coalesce(F.col("__er"), rnull)
                ).alias(ENTRIES)
            )
            df = joined.select(*sel)
            return MatrixTable(df, l._row_key, l._cols + r._cols, l._col_key)

        return VariantDataset(
            outer_concat(self.reference_data, other.reference_data, ["locus"]),
            outer_concat(
                self.variant_data, other.variant_data, ["locus", "alleles"]
            ),
        )

    def to_merged_sparse_mt(self) -> MatrixTable:
        """Rows of both components merged by locus (ref
        vds/methods.py:to_merged_sparse_mt): variant rows keep alleles,
        reference rows get alleles=[ref-block marker]."""
        v = self.variant_data._df
        r = self.reference_data._df
        common = ["locus", "alleles", ENTRIES]
        v2 = v.select("locus", "alleles", F.lit(False).alias("is_ref_block"), F.col(ENTRIES))
        r2 = r.select(
            "locus",
            F.array(F.lit("N"), F.lit("<NON_REF>")).alias("alleles"),
            F.lit(True).alias("is_ref_block"),
            F.col(ENTRIES),
        )
        merged = v2.unionByName(r2, allowMissingColumns=True)
        return MatrixTable(
            merged, ("locus", "alleles"), self.variant_data._cols,
            self.variant_data._col_key, self.variant_data._globals,
        )

    def to_dense_mt(self) -> MatrixTable:
        """Densify (ref vds/methods.py:to_dense_mt): variant-site
        entries missing in variant_data are filled from the covering
        reference block of the same sample.

        Scale shape: reference coverage intervals are exploded once and
        banded into fixed-width position bins; the variant side joins on
        (contig, bin) equality + containment predicate — a hash
        equi-join with bounded fan-out instead of an O(n·m) theta join
        (SURVEY.md §7.3 interval-join strategy)."""
        vd, rd = self.variant_data, self.reference_data
        n = self.n_samples()
        spark = vd._df.sparkSession

        cov = (
            rd._df.select(
                F.col("locus")["contig"].alias("contig"),
                F.col("locus")["position"].alias("start"),
                F.posexplode(ENTRIES).alias("__s", "__re"),
            )
            .filter(F.col("__re").isNotNull())
            .select(
                "contig", "start", "__s", "__re", F.col("__re")["END"].alias("end")
            )
        )
        binned = cov.select(
            "*",
            F.explode(
                F.sequence(
                    (F.col("start") / _BIN).cast("bigint"),
                    (F.col("end") / _BIN).cast("bigint"),
                )
            ).alias("__bin"),
        )
        sites = vd._df.select(
            "locus",
            F.col("locus")["contig"].alias("contig"),
            F.col("locus")["position"].alias("pos"),
            ((F.col("locus")["position"]) / _BIN).cast("bigint").alias("__bin"),
        )
        hits = (
            sites.join(binned, on=["contig", "__bin"], how="left")
            .filter(
                F.col("start").isNull()
                | ((F.col("start") <= F.col("pos")) & (F.col("end") >= F.col("pos")))
            )
            .groupBy("locus")
            .agg(
                F.map_from_entries(
                    F.collect_list(
                        F.when(
                            F.col("__s").isNotNull(), F.struct(F.col("__s"), F.col("__re"))
                        )
                    )
                ).alias("__refmap")
            )
        )
        joined = vd._df.join(hits, on="locus", how="left")
        # ref-block and variant entries have different schemas: rebuild
        # a variant-schema struct field-by-field (GT←hom-ref 0, shared
        # fields like DP/GQ copied from the block, the rest NULL)
        vfields = [f.name for f in vd._df.schema[ENTRIES].dataType.elementType.fields]
        rfields = {f.name for f in rd._df.schema[ENTRIES].dataType.elementType.fields}

        def fill(e, i):
            ref = F.col("__refmap")[i]
            parts = []
            for name in vfields:
                if name == "GT":
                    parts.append(
                        F.coalesce(e["GT"], F.when(ref.isNotNull(), F.lit(0))).alias("GT")
                    )
                elif name in rfields:
                    parts.append(F.coalesce(e[name], ref[name]).alias(name))
                else:
                    parts.append(e[name].alias(name))
            return F.when(e.isNotNull() | ref.isNotNull(), F.struct(*parts))

        dense = joined.select(
            *[c for c in vd._df.columns if c != ENTRIES],
            F.transform(F.col(ENTRIES), fill).alias(ENTRIES),
        )
        return MatrixTable(dense, vd._row_key, vd._cols, vd._col_key, vd._globals)

    def segment_reference_blocks(self, intervals: DataFrame) -> MatrixTable:
        """Split reference blocks at interval boundaries so every output
        block lies entirely within one interval (ref
        vds/methods.py:segment_reference_blocks).

        ``intervals``: DataFrame with ``contig string, start int,
        end int`` rows (inclusive bounds).  Interval lists are small
        (exome/capture regions, ≤ ~1e6 rows) so the join broadcasts —
        each executor clips its own reference rows map-side, no shuffle
        of the (large) reference data.  A block overlapping k intervals
        emits k clipped rows; entries whose per-sample [position, END]
        span misses the interval become null, and rows with no surviving
        entries are dropped.
        """
        rd = self.reference_data
        iv = intervals.select(
            F.col("contig").alias("__ictg"),
            F.col("start").cast("int").alias("__is"),
            F.col("end").cast("int").alias("__ie"),
        )
        src = rd._df.withColumn(
            "__row_end",
            F.array_max(F.transform(ENTRIES, lambda e: e["END"])),
        )
        pos = F.col("locus")["position"]
        joined = src.join(
            F.broadcast(iv),
            (F.col("locus")["contig"] == F.col("__ictg"))
            & (pos <= F.col("__ie"))
            & (F.col("__row_end") >= F.col("__is")),
            "inner",
        )
        new_pos = F.greatest(pos, F.col("__is"))
        clipped = joined.select(
            F.struct(
                F.col("locus")["contig"].alias("contig"),
                new_pos.cast("int").alias("position"),
            ).alias("locus"),
            F.struct(
                F.col("__ictg").alias("contig"),
                F.col("__is").alias("start"),
                F.col("__ie").alias("end"),
            ).alias("interval"),
            F.transform(
                F.col(ENTRIES),
                lambda e: F.when(
                    e.isNotNull()
                    & (e["END"] >= new_pos)
                    & (pos <= F.col("__ie")),
                    e.withField("END", F.least(e["END"], F.col("__ie")).cast("int")),
                ),
            ).alias(ENTRIES),
        ).filter(F.exists(ENTRIES, lambda e: e.isNotNull()))
        return MatrixTable(clipped, ("locus",), rd._cols, rd._col_key)

    def truncate_reference_blocks(self, max_ref_block_base_pairs: int) -> "VariantDataset":
        """Split every reference block longer than ``max_ref_block_base_
        pairs`` into segments of at most that length (ref
        vds/methods.py:truncate_reference_blocks). Long-format explode →
        per-segment rows → regather by new block start; shuffle is
        bounded by output row count, segments per block ≤ len/max."""
        rd = self.reference_data
        n = len(rd._cols)
        L = int(max_ref_block_base_pairs)
        long = (
            rd._df.select(
                F.col("locus")["contig"].alias("contig"),
                F.col("locus")["position"].alias("start"),
                F.posexplode(ENTRIES).alias("__s", "__re"),
            )
            .filter(F.col("__re").isNotNull())
        )
        seg = long.select(
            "contig",
            "__s",
            "__re",
            F.explode(
                F.sequence(F.col("start"), F.col("__re")["END"], F.lit(L))
            ).alias("seg_start"),
        ).select(
            "contig",
            "__s",
            F.col("seg_start"),
            F.col("__re").withField(
                "END",
                F.least(F.col("__re")["END"], F.col("seg_start") + F.lit(L - 1)).cast(
                    "int"
                ),
            ).alias("__re"),
        )
        gathered = seg.groupBy("contig", "seg_start").agg(
            F.map_from_entries(F.collect_list(F.struct("__s", "__re"))).alias("__m")
        )
        rows = gathered.select(
            F.struct(
                F.col("contig"), F.col("seg_start").cast("int").alias("position")
            ).alias("locus"),
            F.transform(
                F.sequence(F.lit(0), F.lit(n - 1)), lambda i: F.col("__m")[i]
            ).alias(ENTRIES),
        )
        return VariantDataset(
            MatrixTable(rows, ("locus",), rd._cols, rd._col_key, rd._globals),
            self.variant_data,
        )

    def merge_reference_blocks(self, equivalence_fields: list[str] = ("GQ",)) -> "VariantDataset":
        """Merge per-sample adjacent reference blocks whose
        ``equivalence_fields`` agree (ref vds/methods.py:
        merge_reference_blocks). Sessionization: window lag over each
        (sample, contig)'s blocks ordered by start; a new session starts
        when blocks are non-contiguous or any equivalence field changes.
        One shuffle keyed by (sample, contig) — the window partitions."""
        from pyspark.sql import Window

        rd = self.reference_data
        n = len(rd._cols)
        eq = list(equivalence_fields)
        long = (
            rd._df.select(
                F.col("locus")["contig"].alias("contig"),
                F.col("locus")["position"].alias("start"),
                F.posexplode(ENTRIES).alias("__s", "__re"),
            )
            .filter(F.col("__re").isNotNull())
        )
        w = Window.partitionBy("__s", "contig").orderBy("start")
        breaks = F.lit(False)
        prev_end = F.lag(F.col("__re")["END"]).over(w)
        breaks = prev_end.isNull() | (prev_end + 1 != F.col("start"))
        for f in eq:
            prev_f = F.lag(F.col("__re")[f]).over(w)
            breaks = breaks | ~(
                (prev_f == F.col("__re")[f])
                | (prev_f.isNull() & F.col("__re")[f].isNull())
            )
        sess = long.withColumn(
            "__grp", F.sum(breaks.cast("int")).over(w)
        )
        re_fields = [
            c.name
            for c in rd._df.schema[ENTRIES].dataType.elementType.fields
            if c.name != "END"
        ]
        merged = sess.groupBy("__s", "contig", "__grp").agg(
            F.min("start").alias("start"),
            F.max(F.col("__re")["END"]).alias("end"),
            # eq fields are constant within a session by construction;
            # non-eq fields summarize as max (the reference keeps min GQ /
            # max DP style summaries — max is the conservative DP merge)
            *[
                (F.first if f in eq else F.max)(F.col("__re")[f]).alias(f)
                for f in re_fields
            ],
        )
        entry = F.struct(
            F.col("end").cast("int").alias("END"),
            *[F.col(f).alias(f) for f in re_fields],
        )
        gathered = merged.select(
            "contig", "start", "__s", entry.alias("__re")
        ).groupBy("contig", "start").agg(
            F.map_from_entries(F.collect_list(F.struct("__s", "__re"))).alias("__m")
        )
        rows = gathered.select(
            F.struct(F.col("contig"), F.col("start").cast("int").alias("position")).alias(
                "locus"
            ),
            F.transform(
                F.sequence(F.lit(0), F.lit(n - 1)), lambda i: F.col("__m")[i]
            ).alias(ENTRIES),
        )
        return VariantDataset(
            MatrixTable(rows, ("locus",), rd._cols, rd._col_key, rd._globals),
            self.variant_data,
        )

    def impute_sex_chromosome_ploidy(
        self,
        normalization_contig: str,
        x_contig: str = "X",
        y_contig: str = "Y",
    ) -> DataFrame:
        """Per-sample X/Y ploidy from length-weighted reference-block DP
        vs a normalization autosome (ref vds/methods.py:
        impute_sex_chromosome_ploidy, coverage path). Returns
        (s, autosomal_mean_dp, x_mean_dp, x_ploidy, y_mean_dp,
        y_ploidy)."""
        rd = self.reference_data
        long = (
            rd._df.select(
                F.col("locus")["contig"].alias("contig"),
                F.col("locus")["position"].alias("start"),
                F.posexplode(ENTRIES).alias("__s", "__re"),
            )
            .filter(F.col("__re").isNotNull() & F.col("__re")["DP"].isNotNull())
            .select(
                "contig",
                "__s",
                (F.col("__re")["END"] - F.col("start") + 1).alias("len"),
                (
                    F.col("__re")["DP"]
                    * (F.col("__re")["END"] - F.col("start") + 1)
                ).alias("dp_bases"),
            )
            .filter(
                F.col("contig").isin([normalization_contig, x_contig, y_contig])
            )
        )
        per = long.groupBy("__s").pivot(
            "contig", [normalization_contig, x_contig, y_contig]
        ).agg(
            (F.sum("dp_bases") / F.sum("len")).alias("mean_dp")
        )
        samples = [c["s"] for c in rd._cols]
        smap = F.array(*[F.lit(s) for s in samples])
        norm = F.col(f"`{normalization_contig}`")
        xm = F.col(f"`{x_contig}`")
        ym = F.col(f"`{y_contig}`")
        return per.select(
            F.element_at(smap, F.col("__s") + 1).alias("s"),
            norm.alias("autosomal_mean_dp"),
            xm.alias("x_mean_dp"),
            (F.lit(2.0) * xm / F.nullif(norm, F.lit(0.0))).alias("x_ploidy"),
            ym.alias("y_mean_dp"),
            (F.lit(2.0) * ym / F.nullif(norm, F.lit(0.0))).alias("y_ploidy"),
        ).orderBy("s")

    def interval_coverage(self) -> DataFrame:
        """Per-sample total reference-covered bases (simplified
        vds/methods.py:interval_coverage)."""
        rd = self.reference_data
        cov = (
            rd._df.select(
                F.col("locus")["position"].alias("start"),
                F.posexplode(ENTRIES).alias("__s", "__re"),
            )
            .filter(F.col("__re").isNotNull())
            .select("__s", (F.col("__re")["END"] - F.col("start") + 1).alias("len"))
            .groupBy("__s")
            .agg(F.sum("len").alias("bases_covered"))
        )
        samples = [c["s"] for c in rd._cols]
        smap = F.array(*[F.lit(s) for s in samples])
        return cov.select(
            F.element_at(smap, F.col("__s") + 1).alias("s"), "bases_covered"
        ).orderBy("s")


# ---------------------------------------------------------------------- #
# module-level surface (ref vds/__init__.py __all__: functions.py
# lgt_to_gt :8 / local_to_global :32, methods.py filter_variants :436 /
# filter_intervals :597 / split_multi :628 / sample_qc sample_qc.py:327 /
# write_variant_datasets :12 / impute_sex_chr_ploidy_from_interval_
# coverage :260, variant_dataset.py read_vds :13 /
# store_ref_block_max_length :71, impex.py read_dense_mt :43, combiner/)
# ---------------------------------------------------------------------- #
def lgt_to_gt(lgta, la):
    """Local-allele-index call → global-allele-index call (ref
    vds/functions.py:8): each local index looks up its global allele in
    the LA array.  Operates on this engine's allele-index-array call
    representation (GTA)."""
    la_ = la if isinstance(la, Column) else F.col(la)
    lg = lgta if isinstance(lgta, Column) else F.col(lgta)
    return F.when(
        lg.isNotNull(),
        F.transform(lg, lambda li: F.element_at(la_, li.cast("int") + 1)),
    )


def local_to_global(array, local_alleles, n_alleles, fill_value, number: str):
    """Reindex a locally-indexed VCF-number array to global indexing
    (ref vds/functions.py:32): number 'A' (per alt), 'R' (per allele),
    'G' (per diploid genotype).  Pure HOF expression — the inverse map
    local_alleles[k] -> k is one map_from_entries lookup per output
    slot."""
    arr = array if isinstance(array, Column) else F.col(array)
    la = local_alleles if isinstance(local_alleles, Column) else F.col(local_alleles)
    n = F.lit(n_alleles) if isinstance(n_alleles, int) else n_alleles
    fill = F.lit(fill_value)

    # global allele -> 1-based local position via the native
    # array_position (0 = absent).  A constructed lookup map would be
    # re-inlined by CollapseProject into every lambda reference and
    # rebuilt O(slots) times per row; array_position is a single cheap
    # builtin per probe.
    def pos_(g):
        return F.array_position(la, g.cast("int"))

    if number == "A":
        return F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda g: F.when(pos_(g) > 1, F.element_at(arr, (pos_(g) - 1).cast("int")))
            .otherwise(fill)
            .alias("v"),
        )
    if number == "R":
        return F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda g: F.when(pos_(g) > 0, F.element_at(arr, pos_(g).cast("int"))).otherwise(
                fill
            ),
        )
    if number == "G":
        # diploid genotype (j,k), j<=k, index k(k+1)/2 + j; local index
        # from the local positions of j and k (ordered)
        def g_of(idx):
            k = F.floor((F.sqrt(8.0 * idx + 1.0) - 1.0) / 2.0).cast("int")
            j = (idx - k * (k + 1) / 2).cast("int")
            lj = pos_(j) - 1  # 0-based, -1 = absent
            lk = pos_(k) - 1
            lo = F.least(lj, lk)
            hi = F.greatest(lj, lk)
            lidx = (hi * (hi + 1) / 2 + lo).cast("int")
            return F.when(
                (lj >= 0) & (lk >= 0),
                F.coalesce(F.element_at(arr, lidx + 1), fill),
            ).otherwise(fill)

        return F.transform(F.sequence(F.lit(0), (n * (n + 1) / 2 - 1).cast("int")), g_of)
    raise ValueError("number must be 'A', 'R' or 'G'")


def read_vds(path: str, spark: SparkSession | None = None) -> VariantDataset:
    """ref vds/variant_dataset.py:13."""
    from .session import get_spark

    return VariantDataset.read(spark or get_spark(), path)


def read_dense_mt(path: str, spark: SparkSession | None = None) -> MatrixTable:
    """Read a VDS and densify (ref vds/impex.py:43 — there a fused
    native read; here read + the banded densify join)."""
    return read_vds(path, spark).to_dense_mt()


def write_variant_datasets(vdss, paths, *, overwrite: bool = False) -> None:
    """ref vds/methods.py:12 — batched writes."""
    for v, p in zip(vdss, paths):
        v.write(p, overwrite=overwrite)


def filter_variants(vds: VariantDataset, variants_table, *, keep: bool = True) -> VariantDataset:
    """Semi/anti join variant_data on (locus, alleles) (ref
    vds/methods.py:436); reference_data untouched, as in the
    reference."""
    vt = variants_table.df if hasattr(variants_table, "df") else variants_table
    keys = [k for k in ("locus", "alleles") if k in vt.columns]
    how = "left_semi" if keep else "left_anti"
    vmt = vds.variant_data
    out = vmt._df.join(vt.select(*keys), on=keys, how=how)
    return VariantDataset(vds.reference_data, vmt._with_df(out))


def filter_intervals(
    vds: VariantDataset, intervals, *, keep: bool = True, split_reference_blocks: bool = False
) -> VariantDataset:
    """Locus-interval filter on both halves (ref vds/methods.py:597):
    variant sites by containment; reference blocks by OVERLAP (END
    reaches into the interval), optionally re-segmented to interval
    boundaries via segment_reference_blocks."""
    rows = intervals
    if hasattr(rows, "df"):
        rows = rows.df
    if isinstance(rows, list):
        from .session import get_spark

        rows = get_spark().createDataFrame(
            [
                {"contig": c, "start": s, "end": e}
                for (c, s, e) in rows
            ]
        )
    ivals = [(r["contig"], r["start"], r["end"]) for r in rows.collect()]

    def contains(locus):
        conds = [
            (locus["contig"] == c) & (locus["position"] >= s) & (locus["position"] <= e)
            for c, s, e in ivals
        ]
        out = F.lit(False)
        for cnd in conds:
            out = out | cnd
        return out

    vmt = vds.variant_data
    vkeep = contains(F.col("locus"))
    vout = vmt._with_df(vmt._df.filter(vkeep if keep else ~vkeep))
    rd = vds.reference_data
    max_end = F.aggregate(
        F.transform(
            F.filter(F.col(ENTRIES), lambda x: x.isNotNull()),
            lambda x: x["END"],
        ),
        F.lit(0),
        F.greatest,
    )

    def overlaps(locus):
        conds = [
            (locus["contig"] == c) & (locus["position"] <= e) & (max_end >= s)
            for c, s, e in ivals
        ]
        out = F.lit(False)
        for cnd in conds:
            out = out | cnd
        return out

    rkeep = overlaps(F.col("locus"))
    rout = rd._with_df(rd._df.filter(rkeep if keep else ~rkeep))
    out_vds = VariantDataset(rout, vout)
    if split_reference_blocks and keep:
        seg = rows if not isinstance(rows, list) else None
        out_vds = VariantDataset(
            MatrixTable(
                out_vds.segment_reference_blocks(seg)._df
                if hasattr(out_vds, "segment_reference_blocks")
                else rout._df,
                rout._row_key, rout._cols, rout._col_key, rout._globals,
            ),
            vout,
        )
    return out_vds


def split_multi(vds: VariantDataset, *, filter_changed_loci: bool = False) -> VariantDataset:
    """Split multiallelic variant sites with local-allele downcode (ref
    vds/methods.py:628) — sparse_split_multi on variant_data;
    reference blocks are biallelic by construction and pass through."""
    from .experimental import sparse_split_multi

    return VariantDataset(
        vds.reference_data,
        sparse_split_multi(vds.variant_data, filter_changed_loci=filter_changed_loci),
    )


def sample_qc(vds: VariantDataset, *, name: str = "sample_qc") -> DataFrame:
    """Per-sample QC over the variant data (ref vds/sample_qc.py:327).
    The reference computes on the sparse representation; here the QC
    kernel runs on variant_data directly (reference blocks carry no
    calls, so the call-rate denominators match the reference's
    gq/dp-exclusive variant stats)."""
    from .methods.qc import sample_qc as _mt_sample_qc

    return _mt_sample_qc(vds.variant_data)


def store_ref_block_max_length(vds_path: str) -> None:
    """Compute max(END - position + 1) over the reference data and
    store it in the VDS metadata (ref variant_dataset.py:71) — readers
    use it to bound interval-query over-read."""
    from .session import get_spark

    spark = get_spark()
    vds = VariantDataset.read(spark, vds_path)
    rd = vds.reference_data._df
    mx = rd.select(
        F.max(
            F.aggregate(
                F.transform(
                    F.filter(F.col(ENTRIES), lambda x: x.isNotNull()),
                    lambda x: x["END"] - F.col("locus")["position"] + 1,
                ),
                F.lit(0),
                F.greatest,
            )
        ).alias("m")
    ).first()["m"]
    meta_path = os.path.join(vds_path, "_vds_metadata.json")
    with open(meta_path) as f:
        meta = json.load(f)
    meta["ref_block_max_length"] = int(mx or 0)
    with open(meta_path, "w") as f:
        json.dump(meta, f)


def impute_sex_chr_ploidy_from_interval_coverage(
    mt_or_df, normalization_contig: str, x_contig: str = "X", y_contig: str = "Y"
) -> DataFrame:
    """Ploidy estimates from an interval-coverage frame (ref
    vds/methods.py:260): input rows (s, contig, bases_over_dp_sum,
    interval_size); ploidy = 2 * contig mean DP / normalization mean
    DP."""
    df = mt_or_df.df if hasattr(mt_or_df, "df") else mt_or_df
    per = (
        df.filter(F.col("contig").isin([normalization_contig, x_contig, y_contig]))
        .groupBy("s")
        .pivot("contig", [normalization_contig, x_contig, y_contig])
        .agg((F.sum("bases_over_dp_sum") / F.sum("interval_size")).alias("mean_dp"))
    )
    norm = F.col(f"`{normalization_contig}`")
    xm, ym = F.col(f"`{x_contig}`"), F.col(f"`{y_contig}`")
    return per.select(
        "s",
        norm.alias("autosomal_mean_dp"),
        xm.alias("x_mean_dp"),
        (F.lit(2.0) * xm / F.nullif(norm, F.lit(0.0))).alias("x_ploidy"),
        ym.alias("y_mean_dp"),
        (F.lit(2.0) * ym / F.nullif(norm, F.lit(0.0))).alias("y_ploidy"),
    ).orderBy("s")


# ---------------------------------------------------------------------- #
# combiner API (ref vds/combiner/__init__.py new_combiner/load_combiner)
# ---------------------------------------------------------------------- #
class VariantDatasetCombiner:
    """Plan-object wrapper around the gVCF combiner (io/gvcf.py
    combine_gvcfs): holds the input list + output path, persists its
    plan as JSON so an interrupted combine can resume (the reference's
    save/load contract; its hierarchical multi-round merge collapses to
    one round here because combine_gvcfs already unions N inputs in a
    single plan)."""

    def __init__(self, output_path: str, temp_path: str = "/tmp", gvcf_paths: list | None = None, vds_paths: list | None = None):
        self.output_path = output_path
        self.temp_path = temp_path
        self.gvcf_paths = list(gvcf_paths or [])
        self.vds_paths = list(vds_paths or [])
        self.finished = False

    def save(self, path: str | None = None) -> str:
        plan = path or os.path.join(self.temp_path, "combiner_plan.json")
        with open(plan, "w") as f:
            json.dump(
                {
                    "name": "hail_spark.VariantDatasetCombiner",
                    "output_path": self.output_path,
                    "temp_path": self.temp_path,
                    "gvcf_paths": self.gvcf_paths,
                    "vds_paths": self.vds_paths,
                    "finished": self.finished,
                },
                f,
            )
        return plan

    def run(self, spark: SparkSession | None = None) -> VariantDataset:
        from .io.gvcf import combine_gvcfs
        from .session import get_spark

        spark = spark or get_spark()
        parts = []
        if self.gvcf_paths:
            parts.append(combine_gvcfs(spark, self.gvcf_paths))
        for p in self.vds_paths:
            parts.append(VariantDataset.read(spark, p))
        if not parts:
            raise ValueError("combiner has no inputs")
        out = parts[0]
        for nxt in parts[1:]:
            out = out.union_cols(nxt)
        out.write(self.output_path, overwrite=True)
        self.finished = True
        return out


def new_combiner(*, output_path: str, temp_path: str = "/tmp", gvcf_paths=None, vds_paths=None, **_kw) -> VariantDatasetCombiner:
    return VariantDatasetCombiner(output_path, temp_path, gvcf_paths, vds_paths)


def load_combiner(path: str) -> VariantDatasetCombiner:
    with open(path) as f:
        plan = json.load(f)
    c = VariantDatasetCombiner(
        plan["output_path"], plan["temp_path"], plan["gvcf_paths"], plan["vds_paths"]
    )
    c.finished = plan.get("finished", False)
    return c


class _CombinerModule:
    """vds.combiner submodule handle (ref hail.vds.combiner)."""

    VariantDatasetCombiner = VariantDatasetCombiner
    new_combiner = staticmethod(new_combiner)
    load_combiner = staticmethod(load_combiner)


combiner = _CombinerModule()


def import_vcf(spark_or_path, path: str | None = None, **kwargs):
    """VDS-level import_vcf (ref vds/impex.py:349): a dense VCF arrives
    as a VDS whose reference_data is empty (every site is a variant
    site)."""
    from .io.vcf import import_vcf as _mt_import_vcf
    from .session import get_spark

    if isinstance(spark_or_path, str):
        spark, p = get_spark(), spark_or_path
    else:
        spark, p = spark_or_path, path
    vmt = _mt_import_vcf(spark, p, **kwargs)
    empty_ref = vmt._with_df(vmt._df.limit(0))
    return VariantDataset(empty_ref, vmt)


def export_vcf(vds: VariantDataset, path: str, **kwargs) -> None:
    """VDS-level export: densify then the MatrixTable VCF writer (ref
    vds/impex.py:210)."""
    from .io.vcf import export_vcf as _mt_export_vcf

    _mt_export_vcf(vds.to_dense_mt(), path, **kwargs)
