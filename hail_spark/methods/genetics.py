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
        F.array(F.element_at("alleles", 1), F.element_at("alleles", F.col("a_index") + 1)).alias(
            "alleles"
        ),
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


def mendel_errors(mt: MatrixTable, fam: DataFrame) -> DataFrame:
    """Autosomal Mendelian error count per variant (ref
    family_methods.py:130, simplified code set):
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


def concordance(mt1: MatrixTable, mt2: MatrixTable) -> DataFrame:
    """Global dosage concordance (ref qc.py:360 simplified): inner-join
    rows on row key, shared samples matched by name; returns one row
    per (left_gt, right_gt) in {-1 missing, 0, 1, 2} with counts."""
    shared = [s["s"] for s in mt1._cols if s["s"] in {c["s"] for c in mt2._cols}]
    i1 = {c["s"]: i for i, c in enumerate(mt1._cols)}
    i2 = {c["s"]: i for i, c in enumerate(mt2._cols)}
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
