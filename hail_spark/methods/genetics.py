"""Genetics method library — split_multi_hts, trio_matrix,
mendel_errors, concordance.

Parity targets (reference hail-is/hail):
* ``split_multi(_hts)`` — statgen.py:3132/:3312: one biallelic row per
  alt allele, genotypes downcoded (alleles other than the split allele
  become ref), ``was_split`` / ``a_index`` row fields.
* ``trio_matrix`` — family_methods.py:16: cols become trios carrying
  (proband, father, mother) entry triples gathered by column index.
* ``mendel_errors`` — family_methods.py:130: per-variant, per-trio
  Mendelian-inconsistency counts (autosomal code set).
* ``concordance`` — qc.py:360: join two matrices on row key, 4×4
  dosage concordance counts (missing/0/1/2).

Spark shape: split_multi is ``posexplode`` + entry ``transform`` (one
narrow pass, no shuffle); trio gathering is an array gather by literal
index (no shuffle); mendel/concordance aggregate with a single
hash-agg shuffle each. All logic stays in Catalyst expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..matrixtable import ENTRIES, MatrixTable


def split_multi(ds, keep_star: bool = False, left_aligned: bool = False, *, permit_shuffle: bool = False):
    """Split multiallelic variants on ROWS only (ref statgen.py:3132).

    Unlike :func:`split_multi_hts` this does not touch the genotypes:
    one output row per alternate allele with biallelic ``alleles``,
    plus ``was_split``, ``a_index``, ``old_locus``, ``old_alleles``.
    All other fields (including entries for a MatrixTable) pass through
    unchanged — downcoding is the caller's job, exactly as the
    reference documents.  ``*`` alleles are dropped unless
    ``keep_star``.  ``left_aligned`` / ``permit_shuffle`` are accepted
    for signature parity; the explode preserves the input ordering so
    no re-sort shuffle is ever needed (a locus's split rows stay
    adjacent and a_index ascends within it).
    """
    from ..table import Table

    is_table = isinstance(ds, Table)
    df = ds._df
    n_alts = F.size("alleles") - 1
    alt_ix = F.sequence(F.lit(1), n_alts)
    if not keep_star:
        alt_ix = F.filter(alt_ix, lambda i: F.element_at("alleles", i + 1) != "*")
    exploded = df.select("*", F.explode(alt_ix).alias("a_index"))
    # concat-of-slices rather than array(element_at, element_at):
    # Spark 4.1's whole-stage codegen miscompiles nested element_at
    # over an array containing a CaseWhen element ("isNull_x is not an
    # rvalue" janino error -> silent interpreted fallback); the slice
    # form generates clean code and is semantically identical here
    # (a_index is always in bounds).
    out = exploded.select(
        *[c for c in df.columns if c not in ("locus", "alleles")],
        "locus",
        F.concat(
            F.slice("alleles", 1, 1), F.slice("alleles", F.col("a_index") + 1, 1)
        ).alias("alleles"),
        (n_alts > 1).alias("was_split"),
        "a_index",
        F.col("locus").alias("old_locus"),
        F.col("alleles").alias("old_alleles"),
    )
    if is_table:
        return Table(out, ds._key)
    return MatrixTable(out, ds._row_key, ds._cols, ds._col_key, ds._globals)


def split_multi_hts(mt: MatrixTable) -> MatrixTable:
    """Explode multiallelic rows to biallelic (ref statgen.py:3312).

    Downcoding: with GTA allele indices, the split-allele dosage is
    ``count(allele == a_index)``; other alt alleles count as ref. PL/AD
    are dropped (the reference recombines them; documented divergence).
    """
    df = mt._df
    n_alts = F.size("alleles") - 1
    exploded = df.select(
        "*", F.posexplode(F.sequence(F.lit(1), n_alts)).alias("__pos", "a_index")
    ).drop("__pos")

    def recode(e: Column) -> Column:
        gta = e["GTA"]
        new_gt = F.when(
            gta.isNotNull(),
            F.aggregate(
                gta,
                F.lit(0),
                lambda acc, al: acc + F.when(al == F.col("a_index"), 1).otherwise(0),
            ),
        )
        fields = [new_gt.alias("GT")]
        for name in ("DP", "GQ"):
            if name in [f.name for f in _entry_fields(mt)]:
                fields.append(e[name].alias(name))
        return F.when(e.isNotNull(), F.struct(*fields))

    out = exploded.select(
        *[c for c in df.columns if c not in ("alleles", ENTRIES)],
        # concat-of-slices: same codegen workaround as split_multi above
        F.concat(
            F.slice("alleles", 1, 1), F.slice("alleles", F.col("a_index") + 1, 1)
        ).alias("alleles"),
        (n_alts > 1).alias("was_split"),
        "a_index",
        F.transform(F.col(ENTRIES), recode).alias(ENTRIES),
    )
    return MatrixTable(out, mt._row_key, mt._cols, mt._col_key, mt._globals)


def _entry_fields(mt: MatrixTable):
    et = mt._df.schema[ENTRIES].dataType.elementType
    return et.fields


def trio_matrix(mt: MatrixTable, fam: DataFrame, complete_trios: bool = True) -> MatrixTable:
    """Cols become trios (ref family_methods.py:16). ``fam`` is an
    import_fam-style frame with id/pat_id/mat_id/fam_id/is_female."""
    sample_idx = {c["s"]: i for i, c in enumerate(mt._cols)}
    trios = []
    for r in fam.collect():
        kid, dad, mom = r["id"], r["pat_id"], r["mat_id"]
        if complete_trios and (dad not in sample_idx or mom not in sample_idx):
            continue
        if kid not in sample_idx:
            continue
        trios.append(
            {
                "id": kid,
                "pat_id": dad,
                "mat_id": mom,
                "fam_id": r["fam_id"] if "fam_id" in r else None,
                "is_female": r["is_female"] if "is_female" in r else None,
                "__ki": sample_idx[kid],
                "__di": sample_idx.get(dad, -1),
                "__mi": sample_idx.get(mom, -1),
            }
        )
    e = F.col(ENTRIES)

    def grab(i: int) -> Column:
        return e[F.lit(i)] if i >= 0 else F.lit(None)

    entry = F.array(
        *[
            F.struct(
                grab(t["__ki"]).alias("proband_entry"),
                grab(t["__di"]).alias("father_entry"),
                grab(t["__mi"]).alias("mother_entry"),
            )
            for t in trios
        ]
    )
    out = mt._df.withColumn(ENTRIES, entry)
    cols = [{k: v for k, v in t.items() if not k.startswith("__")} for t in trios]
    return MatrixTable(out, mt._row_key, cols, ("id",), mt._globals)


def mendel_errors_by_variant(mt: MatrixTable, fam: DataFrame) -> DataFrame:
    """Autosomal Mendelian error count per variant (the engine's
    original flat form; the reference-shaped 4-table tuple is
    :func:`mendel_errors`):
      dad=0 & mom=0 & kid>0 ; dad=2 & mom=2 & kid<2 ;
      dad=0 & mom=2 (or sym.) & kid!=1 ; one parent hom & kid opposite hom.
    Returns rows keyed by the matrix row key with ``n_errors``."""
    tm = trio_matrix(mt, fam)
    e = F.col(ENTRIES)

    def err(t: Column) -> Column:
        k = t["proband_entry"]["GT"]
        d = t["father_entry"]["GT"]
        m = t["mother_entry"]["GT"]
        defined = k.isNotNull() & d.isNotNull() & m.isNotNull()
        bad = (
            ((d == 0) & (m == 0) & (k > 0))
            | ((d == 2) & (m == 2) & (k < 2))
            | ((d == 0) & (m == 2) & (k != 1))
            | ((d == 2) & (m == 0) & (k != 1))
            | ((d == 0) & (m == 1) & (k == 2))
            | ((d == 1) & (m == 0) & (k == 2))
            | ((d == 2) & (m == 1) & (k == 0))
            | ((d == 1) & (m == 2) & (k == 0))
        )
        return F.when(defined & bad, 1).otherwise(0)

    return tm._df.select(
        *tm._row_key,
        F.aggregate(F.transform(e, err), F.lit(0), lambda a, x: a + x).alias("n_errors"),
    )


# Implicated-individual weights per mendel code (ref
# family_methods.py:309-327): index 0 = dad, 1 = mom, 2 = child.
_MENDEL_IMPLICATED = [
    [0, 0, 0],  # dummy (codes are 1-based)
    [1, 1, 1], [1, 1, 1], [1, 0, 1], [0, 1, 1], [0, 0, 1], [1, 0, 1],
    [0, 1, 1], [0, 0, 1], [0, 1, 1], [0, 1, 1], [1, 0, 1], [1, 0, 1],
]


def mendel_errors(mt: MatrixTable, fam: DataFrame):
    """Full Mendel-violation analysis (ref family_methods.py:130
    ``mendel_errors``): the 4-table tuple with the reference's exact
    shapes — (1) all errors keyed by (row key, proband) with fam_id +
    mendel_code; (2) per nuclear family keyed by (pat_id, mat_id) with
    fam_id/children/errors/snp_errors; (3) per individual with each
    error attributed to dad/mom/child per the Implicated table
    (family_methods.py:309), with fam_id/errors/snp_errors and zero
    rows for error-free individuals; (4) per variant over ALL rows.

    Plan: trio_matrix gathers (kid, dad, mom) entry triples by literal
    column index (no shuffle); per (variant, trio) codes come from one
    entries-array HOF pass; table 4 reads the codes array per row with
    no explode; tables 1-3 are the exploded non-null codes plus hash
    aggs — one narrow pass and three aggregations at any scale."""
    from ..expr.functions import is_snp as _is_snp
    from ..expr.functions import mendel_error_code
    from ..table import Table

    tm = trio_matrix(mt, fam)
    key = list(mt._row_key)
    spark = mt._df.sparkSession
    trios = tm._cols
    fem_of = {t["id"]: t.get("is_female") for t in trios}
    # locus struct column for the copy-state (contig via the row key)
    loc = F.col("locus") if "locus" in mt._df.columns else F.struct(
        F.lit("1").alias("contig"), F.lit(1).alias("position")
    )
    codes = F.array(
        *[
            mendel_error_code(
                loc,
                F.lit(bool(fem_of[t["id"]])) if fem_of[t["id"]] is not None else F.lit(True),
                F.col(ENTRIES)[i]["father_entry"]["GT"],
                F.col(ENTRIES)[i]["mother_entry"]["GT"],
                F.col(ENTRIES)[i]["proband_entry"]["GT"],
            )
            for i, t in enumerate(trios)
        ]
    ) if trios else F.array().cast("array<int>")
    has_alleles = "alleles" in mt._df.columns
    snp_col = (
        _is_snp(F.element_at("alleles", 1), F.element_at("alleles", 2))
        if has_alleles
        else F.lit(False)
    )
    df_codes = tm._df.select(
        *key, snp_col.alias("__snp"), codes.alias("__codes")
    )
    # table 4: per-variant over ALL rows — read the codes array in place,
    # no explode, no join (zero-error variants keep their row)
    per_variant = Table(
        df_codes.select(
            *key,
            F.size(F.filter("__codes", lambda c: c.isNotNull()))
            .cast("bigint")
            .alias("errors"),
        ),
        tuple(key),
    )
    # broadcast per-trio attribute arrays (pedigree is driver data)
    def _sarr(vals):
        return (
            F.array(*[F.lit(v).cast("string") for v in vals])
            if vals
            else F.array().cast("array<string>")
        )

    kid_arr = _sarr([t["id"] for t in trios])
    pat_arr = _sarr([t.get("pat_id") for t in trios])
    mat_arr = _sarr([t.get("mat_id") for t in trios])
    fam_arr = _sarr([t.get("fam_id") for t in trios])
    long = (
        df_codes.select(
            *key, "__snp", F.posexplode("__codes").alias("__t", "mendel_code")
        )
        .filter(F.col("mendel_code").isNotNull())
        .select(
            *key,
            "__snp",
            "mendel_code",
            F.element_at(kid_arr, F.col("__t") + 1).alias("s"),
            F.element_at(pat_arr, F.col("__t") + 1).alias("pat_id"),
            F.element_at(mat_arr, F.col("__t") + 1).alias("mat_id"),
            F.element_at(fam_arr, F.col("__t") + 1).alias("fam_id"),
        )
    )
    # table 1: all errors, keyed by (row key, proband)
    errors_t = Table(
        long.select(*key, "s", "fam_id", "mendel_code"), tuple(key) + ("s",)
    )
    # table 2: per nuclear family keyed by parents; every family appears
    # (zero-filled), children = trio count for those parents
    fam_rows = {}
    for t in trios:
        k2 = (t.get("pat_id"), t.get("mat_id"))
        if k2 not in fam_rows:
            fam_rows[k2] = {"pat_id": k2[0], "mat_id": k2[1],
                            "fam_id": t.get("fam_id"), "children": 0}
        fam_rows[k2]["children"] += 1
    fam_df = spark.createDataFrame(
        list(fam_rows.values()) or [],
        "pat_id string, mat_id string, fam_id string, children int",
    )
    fam_counts = long.groupBy("pat_id", "mat_id").agg(
        F.count(F.lit(1)).alias("errors"),
        F.sum(F.when(F.col("__snp"), 1).otherwise(0)).cast("bigint").alias("snp_errors"),
    )
    per_fam = Table(
        F.broadcast(fam_counts).join(fam_df, on=["pat_id", "mat_id"], how="right")
        .na.fill({"errors": 0, "snp_errors": 0})
        .select("pat_id", "mat_id", "fam_id", "children", "errors", "snp_errors"),
        ("pat_id", "mat_id"),
    )
    # table 3: per individual — explode each error to its implicated
    # individuals (dad/mom/child weights per code), then zero-fill the
    # full roster
    impl = F.array(
        *[
            F.array(*[F.lit(w) for w in row])
            for row in _MENDEL_IMPLICATED
        ]
    )
    roles = long.select(
        "__snp",
        "fam_id",
        F.explode(
            F.filter(
                F.array(
                    F.struct(F.col("pat_id").alias("who"),
                             F.element_at(impl, F.col("mendel_code") + 1)[0].alias("w")),
                    F.struct(F.col("mat_id").alias("who"),
                             F.element_at(impl, F.col("mendel_code") + 1)[1].alias("w")),
                    F.struct(F.col("s").alias("who"),
                             F.element_at(impl, F.col("mendel_code") + 1)[2].alias("w")),
                ),
                lambda x: x["w"] == 1,
            )
        ).alias("__r"),
    )
    indiv_counts = roles.groupBy(F.col("__r")["who"].alias("s"), "fam_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("errors"),
        F.sum(F.when(F.col("__snp"), 1).otherwise(0)).cast("bigint").alias("snp_errors"),
    )
    roster = {}
    for t in trios:
        for who in (t.get("pat_id"), t.get("mat_id"), t["id"]):
            roster.setdefault((who, t.get("fam_id")), {"s": who, "fam_id": t.get("fam_id")})
    roster_df = spark.createDataFrame(
        list(roster.values()) or [], "s string, fam_id string"
    )
    per_sample = Table(
        F.broadcast(indiv_counts).join(roster_df, on=["s", "fam_id"], how="right")
        .na.fill({"errors": 0, "snp_errors": 0})
        .select("s", "fam_id", "errors", "snp_errors"),
        ("s",),
    )
    return errors_t, per_fam, per_sample, per_variant


def concordance_pairs(mt1: MatrixTable, mt2: MatrixTable) -> DataFrame:
    """Flat (left_gt, right_gt, n) dosage-concordance counts (the
    engine's original simplified form; the reference-shaped triple is
    :func:`concordance`): inner-join rows on row key, shared samples
    matched by name; -1 encodes missing."""
    k1, k2 = mt1._col_key[0], mt2._col_key[0]
    shared = [s[k1] for s in mt1._cols if s[k1] in {c[k2] for c in mt2._cols}]
    i1 = {c[k1]: i for i, c in enumerate(mt1._cols)}
    i2 = {c[k2]: i for i, c in enumerate(mt2._cols)}
    key = list(mt1._row_key)
    a = mt1._df.select(
        *key,
        F.array(*[F.coalesce(F.col(ENTRIES)[i1[s]]["GT"], F.lit(-1)) for s in shared]).alias(
            "__g1"
        ),
    )
    b = mt2._df.select(
        *key,
        F.array(*[F.coalesce(F.col(ENTRIES)[i2[s]]["GT"], F.lit(-1)) for s in shared]).alias(
            "__g2"
        ),
    )
    j = a.join(b, on=key, how="inner")
    pairs = j.select(
        F.explode(F.zip_with("__g1", "__g2", lambda x, y: F.struct(x.alias("l"), y.alias("r")))).alias(
            "p"
        )
    )
    return (
        pairs.groupBy(F.col("p")["l"].alias("left_gt"), F.col("p")["r"].alias("right_gt"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("left_gt", "right_gt")
    )


def concordance(left: MatrixTable, right: MatrixTable, *, _localize_global_statistics: bool = True):
    """Call concordance (ref qc.py:360): returns the reference's
    ``(global 5x5, cols Table, rows Table)`` triple.  States: 0 = no
    data (variant absent from that dataset), 1 = no call, 2 = hom ref,
    3 = het, 4 = hom var; summary[i][j] counts left-state i vs
    right-state j.

    Plan: one OUTER row-key join of the two per-sample state arrays
    (missing side = all state 0), then (a) rows: a 25-slot HOF count
    per row (codegen, no extra shuffle), (b) cols + global: one
    pair-explode + hash agg on (sample, l, r) — cols are assembled
    driver-side like all col metadata (col dimension is small by the
    engine's design)."""
    from ..table import Table

    k1, k2 = left._col_key[0], right._col_key[0]
    shared = [s[k1] for s in left._cols if s[k1] in {c[k2] for c in right._cols}]
    i1 = {c[k1]: i for i, c in enumerate(left._cols)}
    i2 = {c[k2]: i for i, c in enumerate(right._cols)}
    key = list(left._row_key)
    n_s = len(shared)

    def states(mt, idx):
        e = F.col(ENTRIES)
        # GT null -> 1 (no call); 0/1/2 -> 2/3/4
        return F.array(
            *[
                F.coalesce(e[idx[s]]["GT"] + 2, F.lit(1)).cast("int")
                for s in shared
            ]
        )

    a = left._df.select(*key, states(left, i1).alias("__g1"))
    b = right._df.select(*key, states(right, i2).alias("__g2"))
    j = a.join(b, on=key, how="outer")
    nodata = F.array_repeat(F.lit(0).cast("int"), n_s)
    j = j.select(
        *key,
        F.coalesce(F.col("__g1"), nodata).alias("__g1"),
        F.coalesce(F.col("__g2"), nodata).alias("__g2"),
    )
    pair_code = F.zip_with("__g1", "__g2", lambda l, r: l * 5 + r)

    # rows table: 25-slot counts per row, reshaped 5x5; n_discordant =
    # both-called disagreements
    codes = pair_code.alias("__codes")
    slot_counts = F.transform(
        F.sequence(F.lit(0), F.lit(24)),
        lambda k: F.size(F.filter(F.col("__codes"), lambda c: c == k)).cast("bigint"),
    )
    rows_df = (
        j.select(*key, codes)
        .withColumn("__slots", slot_counts)
        .select(
            *key,
            F.transform(
                F.sequence(F.lit(0), F.lit(4)),
                lambda i: F.slice(F.col("__slots"), i * 5 + 1, 5),
            ).alias("concordance"),
            F.aggregate(
                F.filter(
                    F.col("__codes"),
                    lambda c: (c >= 10) & (c % 5 >= 2) & ((c / 5).cast("int") != c % 5),
                ),
                F.lit(0).cast("bigint"),
                lambda acc, c: acc + 1,
            ).alias("n_discordant"),
        )
    )
    rows_t = Table(rows_df, tuple(key))

    # cols + global from one pair-explode hash agg
    per = (
        j.select(F.posexplode(pair_code).alias("__s", "__c"))
        .groupBy("__s", "__c")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_sample = {}
    for r in per:
        by_sample.setdefault(r["__s"], {})[r["__c"]] = r["n"]
    spark = left._df.sparkSession
    col_rows = []
    for si, samp in enumerate(shared):
        m = by_sample.get(si, {})
        mat = [[int(m.get(i * 5 + jx, 0)) for jx in range(5)] for i in range(5)]
        nd = sum(
            m.get(i * 5 + jx, 0)
            for i in range(2, 5)
            for jx in range(2, 5)
            if i != jx
        )
        col_rows.append({k1: samp, "concordance": mat, "n_discordant": int(nd)})
    cols_t = Table(
        spark.createDataFrame(
            col_rows,
            f"{k1} string, concordance array<array<bigint>>, n_discordant bigint",
        ),
        (k1,),
    )
    glob = [
        [
            sum(by_sample.get(si, {}).get(i * 5 + jx, 0) for si in range(n_s))
            for jx in range(5)
        ]
        for i in range(5)
    ]
    if not _localize_global_statistics:
        glob_df = spark.createDataFrame(
            [{"concordance": glob}], "concordance array<array<bigint>>"
        )
        return glob_df, cols_t, rows_t
    return glob, cols_t, rows_t


def balding_nichols_model(
    spark,
    n_populations: int,
    n_samples: int,
    n_variants: int,
    fst: float = 0.1,
    seed: int = 0,
    n_partitions: int | None = None,
) -> MatrixTable:
    """Simulated cohort (ref statgen.py:3984): ancestral allele
    frequency per variant, per-population Balding-Nichols Beta draw,
    binomial genotypes. Generation is distributed over variant ranges
    (spark.range → mapInPandas, numpy RNG seeded per variant — one
    deterministic stream regardless of partitioning)."""
    import numpy as np
    import pandas as pd

    pops = np.random.default_rng(seed).integers(0, n_populations, n_samples)

    def gen(batches):
        for pdf in batches:
            rows = []
            for vid in pdf["id"]:
                rng = np.random.default_rng((seed, int(vid)))
                p0 = rng.uniform(0.1, 0.9)
                a = p0 * (1 - fst) / fst
                b = (1 - p0) * (1 - fst) / fst
                pk = rng.beta(a, b, size=n_populations)
                gts = rng.binomial(2, pk[pops])
                rows.append(
                    {
                        "locus": {"contig": "1", "position": int(vid) + 1},
                        "alleles": ["A", "C"],
                        ENTRIES: [{"GT": int(g)} for g in gts],
                    }
                )
            yield pd.DataFrame(rows)

    nparts = n_partitions or spark.sparkContext.defaultParallelism
    df = spark.range(n_variants, numPartitions=nparts).mapInPandas(
        gen,
        schema=(
            "locus struct<contig:string, position:int>, alleles array<string>, "
            f"{ENTRIES} array<struct<GT:int>>"
        ),
    )
    cols = [{"s": f"sample_{i}", "pop": int(pops[i])} for i in range(n_samples)]
    return MatrixTable(df, ("locus", "alleles"), cols, ("s",))


def impute_sex(mt: MatrixTable, x_contigs: tuple[str, ...] = ("X", "chrX"),
               female_threshold: float = 0.2, male_threshold: float = 0.8) -> DataFrame:
    """Per-sample X-chromosome inbreeding coefficient
    F = (obs_hom − exp_hom) / (n − exp_hom) and sex call
    (ref statgen.py:73). One map-only accumulation pass."""
    import numpy as np
    import pandas as pd

    from .statgen import _entry_matrix, _x_doubles

    n = len(mt._cols)
    xdf = mt._df.filter(F.col("locus")["contig"].isin(list(x_contigs)))

    def acc(batches):
        obs_hom = np.zeros(n)
        exp_hom = np.zeros(n)
        n_called = np.zeros(n)
        for pdf in batches:
            X = _entry_matrix(pdf[ENTRIES], "GT", n)
            p = np.nanmean(X, axis=1) / 2.0
            ok = (p > 0) & (p < 1) & ~np.isnan(p)
            X, p = X[ok], p[ok]
            called = ~np.isnan(X)
            hom = called & ((X == 0) | (X == 2))
            obs_hom += hom.sum(axis=0)
            exp_hom += ((1.0 - 2.0 * p * (1.0 - p))[:, None] * called).sum(axis=0)
            n_called += called.sum(axis=0)
        yield pd.DataFrame(
            {"i": range(n), "obs": obs_hom, "exp": exp_hom, "n": n_called}
        )

    parts = xdf.select(_x_doubles("GT")).mapInPandas(
        acc, schema="i int, obs double, exp double, n double"
    ).groupBy("i").agg(
        F.sum("obs").alias("obs"), F.sum("exp").alias("exp"), F.sum("n").alias("n")
    ).collect()
    spark = mt._df.sparkSession
    rows = []
    for r in sorted(parts, key=lambda r: r["i"]):
        denom = r["n"] - r["exp"]
        f_stat = (r["obs"] - r["exp"]) / denom if abs(denom) > 1e-12 else float("nan")
        is_female = (
            None
            if f_stat != f_stat or (female_threshold < f_stat < male_threshold)
            else bool(f_stat < female_threshold)
        )
        rows.append(
            {
                "s": mt._cols[r["i"]]["s"],
                "is_female": is_female,
                "f_stat": float(f_stat),
                "n_called": int(r["n"]),
                "expected_homs": float(r["exp"]),
                "observed_homs": float(r["obs"]),
            }
        )
    return spark.createDataFrame(
        rows,
        "s string, is_female boolean, f_stat double, n_called bigint, "
        "expected_homs double, observed_homs double",
    )


# TDT transmission/untransmission counts per (dad, mom, kid) dosage
# combo (classic biallelic table; ref family_methods.py:377)
_TDT_COMBOS = {
    (1, 1, 0): (0, 2), (1, 1, 1): (1, 1), (1, 1, 2): (2, 0),
    (1, 0, 0): (0, 1), (1, 0, 1): (1, 0),
    (0, 1, 0): (0, 1), (0, 1, 1): (1, 0),
    (1, 2, 1): (0, 1), (1, 2, 2): (1, 0),
    (2, 1, 1): (0, 1), (2, 1, 2): (1, 0),
}


def transmission_disequilibrium_test(mt: MatrixTable, fam: DataFrame) -> DataFrame:
    """TDT (ref family_methods.py:377): per variant, count alt-allele
    transmissions (t) vs untransmissions (u) from het parents across
    trios; χ² = (t−u)²/(t+u), upper-tail p. Counting is a fold over the
    trio entries array in codegen; the p-value is a pandas-UDF finalizer."""
    from ..expr.stats import _UDF_KERNELS  # noqa: F401  (module init)
    from ..expr import stats as st

    tm = trio_matrix(mt, fam)

    def combo_counts(t: Column) -> Column:
        k = t["proband_entry"]["GT"]
        d = t["father_entry"]["GT"]
        m = t["mother_entry"]["GT"]
        tt = F.lit(0)
        uu = F.lit(0)
        for (dd, mm, kk), (ti, ui) in _TDT_COMBOS.items():
            hit = (d == dd) & (m == mm) & (k == kk)
            if ti:
                tt = tt + F.when(hit, ti).otherwise(0)
            if ui:
                uu = uu + F.when(hit, ui).otherwise(0)
        return F.struct(tt.alias("t"), uu.alias("u"))

    per_row = tm._df.select(
        *tm._row_key,
        F.aggregate(
            F.transform(F.col(ENTRIES), combo_counts),
            F.struct(F.lit(0).alias("t"), F.lit(0).alias("u")),
            lambda acc, x: F.struct(
                (acc["t"] + x["t"]).alias("t"), (acc["u"] + x["u"]).alias("u")
            ),
        ).alias("__tu"),
    )
    t_c = F.col("__tu")["t"].cast("double")
    u_c = F.col("__tu")["u"].cast("double")
    chi2 = (t_c - u_c) * (t_c - u_c) / F.nullif(t_c + u_c, F.lit(0.0))
    return per_row.select(
        *tm._row_key,
        F.col("__tu")["t"].alias("t"),
        F.col("__tu")["u"].alias("u"),
        chi2.alias("chi_sq"),
        st.pchisqtail_udf(F.coalesce(chi2, F.lit(0.0)), F.lit(1.0)).alias("p_value"),
    )


def de_novo_candidates(mt: MatrixTable, fam: DataFrame, min_kid_dp: int = 0) -> DataFrame:
    """Candidate de novo mutations (simplified ref
    family_methods.py:564 de_novo): kid het, both parents hom-ref,
    optional kid depth filter. Returns (row key, kid id) rows."""
    # Build a flat scalar-field trio array directly (NOT via trio_matrix's
    # nested entry structs): nested-struct access through a Generate over
    # a deep VCF-parse lineage sends Catalyst's nested-column aliasing
    # into a blow-up; scalar struct fields keep the rewrite linear.
    sample_idx = {c["s"]: i for i, c in enumerate(mt._cols)}
    g = F.col(ENTRIES)
    trio_structs = []
    for r in fam.collect():
        kid, dad, mom = r["id"], r["pat_id"], r["mat_id"]
        if kid in sample_idx and dad in sample_idx and mom in sample_idx:
            trio_structs.append(
                F.struct(
                    F.lit(kid).alias("id"),
                    g[sample_idx[kid]]["GT"].alias("k"),
                    g[sample_idx[dad]]["GT"].alias("d"),
                    g[sample_idx[mom]]["GT"].alias("m"),
                    g[sample_idx[kid]]["DP"].alias("dp"),
                )
            )
    if not trio_structs:
        return mt._df.select(*mt._row_key, F.lit(None).cast("string").alias("id")).limit(0)
    t = F.col("__t")
    exploded = mt._df.select(
        *mt._row_key, F.explode(F.array(*trio_structs)).alias("__t")
    )
    hits = exploded.filter(
        (t["k"] == 1)
        & (t["d"] == 0)
        & (t["m"] == 0)
        & (F.coalesce(t["dp"], F.lit(min_kid_dp)) >= min_kid_dp)
    )
    return hits.select(*mt._row_key, t["id"].alias("id"))


def filter_alleles(mt: MatrixTable, pred) -> MatrixTable:
    """Subset alternate alleles by predicate, downcoding removed alleles
    to ref (ref statgen.py:4295 `filter_alleles` / :4405
    `filter_alleles_hts` with behavior='downcode').

    ``pred(ref: Column, alt: Column, a_index: Column) -> Column[bool]``
    decides which alt alleles survive.  Rows whose alt set empties are
    dropped.  Entry recode (GTA allele-index lists, the multiallelic
    representation used by split_multi_hts, genetics.py above): each
    called allele maps old-index → new-index via the computed remap
    array; removed alleles downcode to 0 (ref).  GT (biallelic dosage)
    is recomputed as count of non-ref after remap.  Pure array-HOF
    expressions — no UDF, stays in codegen.
    """
    df = mt._df
    ref = F.element_at("alleles", 1)
    n_alts = F.size("alleles") - 1
    # old alt index (1-based) → keep flag
    keep_flags = F.transform(
        F.sequence(F.lit(1), n_alts),
        lambda i: pred(ref, F.element_at("alleles", i + 1), i),
    )
    # remap[old_index] = new index among kept (0 = downcoded to ref);
    # remap[0] = 0 for ref itself
    remap = F.concat(
        F.array(F.lit(0)),
        F.transform(
            F.sequence(F.lit(1), n_alts),
            lambda i: F.when(
                F.element_at(keep_flags, i),
                F.aggregate(
                    F.slice(keep_flags, 1, i),
                    F.lit(0),
                    lambda a, k: a + F.when(k, 1).otherwise(0),
                ),
            ).otherwise(0),
        ),
    )
    new_alleles = F.concat(
        F.array(ref),
        F.transform(
            F.filter(
                F.arrays_zip(F.slice("alleles", 2, 1 << 20).alias("a"), keep_flags.alias("k")),
                lambda z: z["k"],
            ),
            lambda z: z["a"],
        ),
    )
    ent_fields = [f.name for f in df.schema[ENTRIES].dataType.elementType.fields]

    def recode(e: Column) -> Column:
        fields = []
        if "GTA" in ent_fields:
            new_gta = F.transform(e["GTA"], lambda al: F.element_at(F.col("__remap"), al + 1))
            fields.append(new_gta.alias("GTA"))
            fields.append(
                F.when(
                    new_gta.isNotNull(),
                    F.aggregate(
                        new_gta, F.lit(0), lambda a, al: a + F.when(al > 0, 1).otherwise(0)
                    ),
                ).alias("GT")
            )
        elif "GT" in ent_fields:
            # biallelic input: alt either survives (unchanged) or rows drop
            fields.append(e["GT"].alias("GT"))
        for name in ent_fields:
            if name not in ("GTA", "GT"):
                fields.append(e[name].alias(name))
        return F.when(e.isNotNull(), F.struct(*fields))

    out = (
        df.withColumn("__remap", remap)
        .withColumn("old_alleles", F.col("alleles"))
        .withColumn("alleles", new_alleles)
        .where(F.size("alleles") >= 2)
        .withColumn(ENTRIES, F.transform(F.col(ENTRIES), recode))
        .drop("__remap")
    )
    return MatrixTable(out, mt._row_key, mt._cols, mt._col_key, mt._globals)


def filter_alleles_hts(mt: MatrixTable, f, subset: bool = False) -> MatrixTable:
    """HTS-schema allele filter (ref statgen.py:4405).

    ``subset=False`` (downcode) is exactly :func:`filter_alleles` —
    removed alleles fold into ref and GT is recomputed from the
    remapped allele list.  ``subset=True`` (PL-based genotype
    re-call from the subset likelihoods) needs per-genotype PL arrays,
    which this engine drops on import (documented divergence in
    split_multi_hts); it raises rather than silently downcoding.
    """
    if subset:
        raise NotImplementedError(
            "filter_alleles_hts(subset=True) requires PL likelihoods, "
            "which this engine does not carry; use subset=False (downcode)"
        )
    return filter_alleles(mt, f)


def de_novo(mt: MatrixTable, fam: DataFrame, min_kid_dp: int = 0) -> DataFrame:
    """Parity alias for :func:`de_novo_candidates` (ref
    family_methods.py:564 ``de_novo``).  The reference's full caller
    also scores candidates against a population-frequency prior; this
    engine returns the candidate set (kid het, parents hom-ref, depth
    gate) — the prior-based confidence model is a documented
    divergence."""
    return de_novo_candidates(mt, fam, min_kid_dp=min_kid_dp)
