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

from pyspark.sql import DataFrame, SparkSession
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
