"""Reference genomes, locus coordinate functions, and liftover.

Parity targets (reference hail-is/hail):
* ``ReferenceGenome`` — hail/hail/src/is/hail/variant/ReferenceGenome.scala
  (contigs, lengths, X/Y/MT/PAR metadata; built-ins GRCh37/GRCh38 ship as
  JSON resources).  Here a plain dataclass; the built-in contig lengths
  are the published GRCh37/GRCh38 assembly values (public UCSC/Ensembl
  data).
* ``contig_length`` / ``locus_from_global_position`` / global position —
  functions.py:6447-6571, LocusFunctions.scala.  Spark mapping: the
  genome is a driver-side constant folded into ``create_map`` literals,
  so lookups stay inside whole-stage codegen — no UDF, no join, no
  shuffle; the literal travels with the serialized plan exactly like a
  broadcast of a few hundred entries.
* ``liftover`` — functions.py:6498 (hl.liftover), ReferenceGenome
  liftover via UCSC chain files.  Spark mapping: the chain file parses
  driver-side into an interval DataFrame and lifting is a broadcast
  range join (chain files are ~KB-MB — always broadcastable), point
  predicate ``src_start <= pos0 < src_end``.  At 100 TB of loci this is
  a map-side-only broadcast hash join with an inlined range filter.
* ``parse_variant`` — functions.py:6185 (contig:pos:ref:alts string →
  struct(locus, alleles)).
* ``get_sequence`` — functions.py:6571 (FASTA lookup).  Test-scale
  implementation: the FASTA loads driver-side and broadcasts as a
  contig→sequence dict consulted by a vectorized UDF; a production
  variant would range-read a bgzipped+faidx'd FASTA per partition
  instead of broadcasting whole contigs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Published assembly lengths (UCSC/Ensembl public data).
_GRCH37_LENGTHS = {
    "1": 249250621, "2": 243199373, "3": 198022430, "4": 191154276,
    "5": 180915260, "6": 171115067, "7": 159138663, "8": 146364022,
    "9": 141213431, "10": 135534747, "11": 135006516, "12": 133851895,
    "13": 115169878, "14": 107349540, "15": 102531392, "16": 90354753,
    "17": 81195210, "18": 78077248, "19": 59128983, "20": 63025520,
    "21": 48129895, "22": 51304566, "X": 155270560, "Y": 59373566,
    "MT": 16569,
}
_GRCH38_LENGTHS = {
    "chr1": 248956422, "chr2": 242193529, "chr3": 198295559,
    "chr4": 190214555, "chr5": 181538259, "chr6": 170805979,
    "chr7": 159345973, "chr8": 145138636, "chr9": 138394717,
    "chr10": 133797422, "chr11": 135086622, "chr12": 133275309,
    "chr13": 114364328, "chr14": 107043718, "chr15": 101991189,
    "chr16": 90338345, "chr17": 83257441, "chr18": 80373285,
    "chr19": 58617616, "chr20": 64444167, "chr21": 46709983,
    "chr22": 50818468, "chrX": 156040895, "chrY": 57227415,
    "chrM": 16569,
}


@dataclass(frozen=True)
class ReferenceGenome:
    """Contig metadata (ref ReferenceGenome.scala; python
    hail/python/hail/genetics/reference_genome.py)."""

    name: str
    contigs: tuple
    lengths: dict
    x_contigs: tuple = ()
    y_contigs: tuple = ()
    mt_contigs: tuple = ()
    _offsets: dict = field(default_factory=dict, compare=False)

    def __post_init__(self):
        off, acc = {}, 0
        for c in self.contigs:
            off[c] = acc
            acc += self.lengths[c]
        object.__setattr__(self, "_offsets", off)

    @property
    def total_length(self) -> int:
        return sum(self.lengths[c] for c in self.contigs)

    def contig_length(self, contig) -> Column:
        """Length of a contig column (ref functions.py:6447) — map
        literal, missing contig → null (the reference errors; null keeps
        the op total and filterable)."""
        m = F.create_map(
            *[F.lit(x) for c in self.contigs for x in (c, self.lengths[c])]
        )
        return F.element_at(m, _c(contig))

    def global_position(self, contig, position) -> Column:
        """0-based position on the flattened genome (ref
        Locus.position → globalPos, functions.py `hl.locus(...)
        .global_position()`)."""
        m = F.create_map(
            *[F.lit(x) for c in self.contigs for x in (c, self._offsets[c])]
        )
        return (F.element_at(m, _c(contig)) + _c(position) - 1).cast("bigint")

    def locus_from_global_position(self, gpos) -> Column:
        """Inverse of global_position (ref functions.py:6520
        `hl.locus_from_global_position`) — a fold over the (few dozen)
        contigs, constant-folded by Catalyst."""
        g = _c(gpos)
        expr = F.lit(None).cast(
            "struct<contig:string,position:int>"
        )
        # build the when-chain from the last contig backwards
        for c in reversed(self.contigs):
            off = self._offsets[c]
            expr = F.when(
                (g >= off) & (g < off + self.lengths[c]),
                F.struct(
                    F.lit(c).alias("contig"),
                    (g - off + 1).cast("int").alias("position"),
                ),
            ).otherwise(expr)
        return expr

    def is_valid_locus(self, contig, position) -> Column:
        p = _c(position)
        return (p >= 1) & (p <= F.coalesce(self.contig_length(contig), F.lit(0)))


GRCH37 = ReferenceGenome(
    "GRCh37",
    tuple(_GRCH37_LENGTHS),
    _GRCH37_LENGTHS,
    ("X",),
    ("Y",),
    ("MT",),
)
GRCH38 = ReferenceGenome(
    "GRCh38",
    tuple(_GRCH38_LENGTHS),
    _GRCH38_LENGTHS,
    ("chrX",),
    ("chrY",),
    ("chrM",),
)


def _c(x):
    return x if isinstance(x, Column) else F.lit(x)


def parse_variant(s) -> Column:
    """'contig:pos:ref:alt1,alt2' → struct(locus, alleles) (ref
    functions.py:6185 hl.parse_variant)."""
    parts = F.split(_c(s), ":")
    return F.struct(
        F.struct(
            F.element_at(parts, 1).alias("contig"),
            F.element_at(parts, 2).cast("int").alias("position"),
        ).alias("locus"),
        F.concat(
            F.array(F.element_at(parts, 3)),
            F.split(F.element_at(parts, 4), ","),
        ).alias("alleles"),
    )


# --------------------------------------------------------------------- #
# liftover (UCSC chain format; ref ReferenceGenome.addLiftover +
# LiftOver.scala wrapping htsjdk — we re-derive from the published chain
# format spec instead)
# --------------------------------------------------------------------- #
def parse_chain_file(path: str) -> list:
    """Parse a UCSC .over.chain file into aligned-block records
    [(src_contig, src_start, src_end, dst_contig, dst_pos, strand)],
    all 0-based half-open on the + strand of the source.

    Format (published UCSC spec): a ``chain`` header line
    ``chain score tName tSize tStrand tStart tEnd qName qSize qStrand
    qStart qEnd id`` followed by block lines ``size [dt dq]``.
    """
    blocks = []
    with open(path) as f:
        header = None
        t_pos = q_pos = 0
        for raw in f:
            line = raw.strip()
            if not line:
                header = None
                continue
            parts = line.split()
            if parts[0] == "chain":
                header = parts
                t_pos = int(parts[5])
                q_pos = int(parts[10])
                continue
            if header is None:
                continue
            size = int(parts[0])
            t_name, q_name = header[2], header[7]
            q_strand = header[9]
            q_size = int(header[8])
            if q_strand == "+":
                blocks.append((t_name, t_pos, t_pos + size, q_name, q_pos, 1))
            else:
                # negative strand: q coords count from the reverse
                # complement start; convert to forward coords
                blocks.append(
                    (t_name, t_pos, t_pos + size, q_name, q_size - q_pos - size, -1)
                )
            if len(parts) == 3:
                t_pos += size + int(parts[1])
                q_pos += size + int(parts[2])
            else:
                t_pos += size
                q_pos += size
    return blocks


def chain_to_df(spark, blocks) -> DataFrame:
    return spark.createDataFrame(
        [
            {
                "src_contig": b[0], "src_start": b[1], "src_end": b[2],
                "dst_contig": b[3], "dst_pos": b[4], "strand": b[5],
            }
            for b in blocks
        ],
        "src_contig string, src_start bigint, src_end bigint, "
        "dst_contig string, dst_pos bigint, strand int",
    )


def _disjoint_chain(rows) -> list:
    """Sweep chain blocks into DISJOINT src segments (driver-side; the
    chain is broadcast-small). A src region covered by more than one
    chain block maps to null — htsjdk's LiftOver reports failure on
    ambiguous overlapping chains rather than emitting multiple targets,
    and the disjoint segments guarantee the range join below matches at
    most one row per locus (no row duplication)."""
    from collections import defaultdict

    by_contig = defaultdict(list)
    for b in rows:
        by_contig[b["src_contig"]].append(b)
    segs = []
    for contig, bs in by_contig.items():
        events = []
        for i, b in enumerate(bs):
            events.append((b["src_start"], 1, i))
            events.append((b["src_end"], 0, i))
        events.sort()  # ends (0) before starts (1): touching blocks don't overlap
        active: set[int] = set()
        prev = None
        for pos, kind, i in events:
            if prev is not None and pos > prev and active:
                if len(active) == 1:
                    b = bs[next(iter(active))]
                    segs.append(
                        (contig, prev, pos, b["src_start"], b["src_end"],
                         b["dst_contig"], b["dst_pos"], b["strand"])
                    )
                else:  # ambiguous: covered by 2+ chains
                    segs.append((contig, prev, pos, None, None, None, None, None))
            prev = pos
            if kind == 0:
                active.discard(i)
            else:
                active.add(i)
    return segs


def liftover(
    df: DataFrame,
    chain: DataFrame,
    contig: str = "contig",
    position: str = "position",
) -> DataFrame:
    """Lift 1-based loci through a chain table (ref functions.py:6498
    hl.liftover).  Broadcast range join: chain files are small (KB-MB),
    so every executor filters its loci against the broadcast block list
    map-side — no shuffle of the (possibly 100 TB) locus table.  Loci
    falling in a chain gap come back with null target fields, matching
    the reference's missing-on-no-match contract; loci covered by
    overlapping chains are ambiguous and also come back null (htsjdk
    parity), never duplicated.

    Adds columns ``target_contig``, ``target_position``,
    ``target_strand`` (+1/-1).
    """
    spark = df.sparkSession
    segs = _disjoint_chain(chain.collect())
    seg_df = spark.createDataFrame(
        segs,
        "src_contig string, seg_start bigint, seg_end bigint, "
        "src_start bigint, src_end bigint, dst_contig string, "
        "dst_pos bigint, strand int",
    )
    pos0 = F.col(position).cast("bigint") - 1
    cond = (
        (F.col(contig) == F.col("src_contig"))
        & (pos0 >= F.col("seg_start"))
        & (pos0 < F.col("seg_end"))
    )
    joined = df.join(F.broadcast(seg_df), on=cond, how="left")
    off = pos0 - F.col("src_start")
    tgt_pos0 = F.when(F.col("strand") == 1, F.col("dst_pos") + off).otherwise(
        F.col("dst_pos") + (F.col("src_end") - 1 - pos0)
    )
    return joined.select(
        *df.columns,
        F.col("dst_contig").alias("target_contig"),
        (tgt_pos0 + 1).cast("int").alias("target_position"),
        F.col("strand").alias("target_strand"),
    )


# --------------------------------------------------------------------- #
# sequence lookup
# --------------------------------------------------------------------- #
def load_fasta(path: str) -> dict:
    """Driver-side FASTA → {contig: sequence} (test scale; a production
    reader would faidx-range-read per partition instead)."""
    seqs, name, chunks = {}, None, []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith(">"):
                if name is not None:
                    seqs[name] = "".join(chunks)
                name = line[1:].split()[0]
                chunks = []
            elif line:
                chunks.append(line)
    if name is not None:
        seqs[name] = "".join(chunks)
    return seqs


def get_sequence(spark, fasta: dict, contig, position, before=0, after=0) -> Column:
    """Reference bases at locus ± flanks (ref functions.py:6571
    hl.get_sequence), via a broadcast contig→sequence dict and an
    Arrow-batched pandas UDF (the lookup is pure string slicing)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    b = spark.sparkContext.broadcast(fasta)

    def _seq(c, p):
        d = b.value

        def one(cg, pos):
            s = d.get(cg)
            if s is None or pos is None:
                return None
            start = max(0, int(pos) - 1 - before)
            end = min(len(s), int(pos) + after)
            return s[start:end] if 0 <= start < len(s) else None

        return pd.Series([one(cg, pos) for cg, pos in zip(c, p)])

    seq = pandas_udf(_seq, "string")
    return seq(_c(contig), _c(position))


# ------------------------------------------------------------------ #
# reference-genome registry (ref hl.get_reference / default_reference /
# ReferenceGenome registry in hail/genetics/reference_genome.py)
# ------------------------------------------------------------------ #
_REGISTRY: dict[str, ReferenceGenome] = {"GRCh37": GRCH37, "GRCh38": GRCH38}
_DEFAULT = "GRCh37"  # the reference's default


def get_reference(name: str) -> ReferenceGenome:
    """hl.get_reference: look up a registered genome by name."""
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown reference genome '{name}'; registered: {sorted(_REGISTRY)}"
        ) from None


def add_reference(rg: ReferenceGenome) -> ReferenceGenome:
    """Register a custom genome (ref ReferenceGenome constructor side
    effect)."""
    _REGISTRY[rg.name] = rg
    return rg


def default_reference(new_default: "str | ReferenceGenome | None" = None) -> ReferenceGenome:
    """hl.default_reference: get — or, with an argument, set — the
    session default genome."""
    global _DEFAULT
    if new_default is not None:
        name = new_default if isinstance(new_default, str) else new_default.name
        get_reference(name) if isinstance(new_default, str) else add_reference(new_default)
        _DEFAULT = name
    return _REGISTRY[_DEFAULT]
