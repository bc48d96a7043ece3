"""Driver-side genetics value types (ref hail/python/hail/genetics/):
AlleleType, Call, Locus, Trio, Pedigree — plain Python objects used to
construct literals and read .fam files; the distributed counterparts
live in expr/functions.py (calls), expr/genome.py (ReferenceGenome,
loci) and methods/genetics.py (trio methods).

Note: `hail_spark.methods.genetics` (the method library) is a different
module; the reference has the same split (hail.genetics vs
hail.methods).
"""

from __future__ import annotations

from enum import IntEnum, auto

from .expr.genome import ReferenceGenome  # noqa: F401  (re-export)


class AlleleType(IntEnum):
    """ref genetics/allele_type.py:17 — values mirror
    hf.numeric_allele_type's encoding."""

    UNKNOWN = 0
    SNP = auto()
    MNP = auto()
    INSERTION = auto()
    DELETION = auto()
    COMPLEX = auto()
    STAR = auto()
    SYMBOLIC = auto()
    TRANSITION = auto()
    TRANSVERSION = auto()

    @staticmethod
    def strings():
        return [at.name.lower() for at in AlleleType]


class Locus:
    """ref genetics/locus.py: (contig, position) on a reference
    genome.  Converts to/from the engine's struct representation."""

    def __init__(self, contig, position: int, reference_genome: str = "GRCh37"):
        self.contig = str(contig)
        self.position = int(position)
        self.reference_genome = reference_genome

    @classmethod
    def parse(cls, string: str, reference_genome: str = "GRCh37") -> "Locus":
        contig, pos = string.rsplit(":", 1)
        return cls(contig, int(pos), reference_genome)

    def as_dict(self) -> dict:
        return {"contig": self.contig, "position": self.position}

    def __eq__(self, other):
        return (
            isinstance(other, Locus)
            and (self.contig, self.position) == (other.contig, other.position)
        )

    def __hash__(self):
        return hash((self.contig, self.position))

    def __repr__(self):
        return f"Locus(contig={self.contig}, position={self.position}, reference_genome={self.reference_genome})"

    def __str__(self):
        return f"{self.contig}:{self.position}"


class Call:
    """ref genetics/call.py: genotype call from allele indices."""

    def __init__(self, alleles, phased: bool = False):
        self.alleles = list(alleles)
        self.phased = bool(phased)

    @property
    def ploidy(self) -> int:
        return len(self.alleles)

    def n_alt_alleles(self) -> int:
        return sum(1 for a in self.alleles if a != 0)

    def is_hom_ref(self) -> bool:
        return all(a == 0 for a in self.alleles)

    def is_het(self) -> bool:
        return self.ploidy == 2 and self.alleles[0] != self.alleles[1]

    def is_hom_var(self) -> bool:
        return all(a == self.alleles[0] and a > 0 for a in self.alleles)

    def is_non_ref(self) -> bool:
        return any(a != 0 for a in self.alleles)

    def is_diploid(self) -> bool:
        return self.ploidy == 2

    def unphased_diploid_gt_index(self) -> int:
        if self.ploidy != 2:
            raise ValueError("unphased_diploid_gt_index requires diploid calls")
        j, k = sorted(self.alleles)
        return k * (k + 1) // 2 + j

    def as_struct(self) -> dict:
        """The engine's parsed-call struct (expr/functions.py
        parse_call)."""
        return {"GT": self.n_alt_alleles(), "ploidy": self.ploidy, "phased": self.phased}

    @classmethod
    def from_int32(cls, c: int) -> "Call":
        """Decode the reference's packed int32 call (variant/Call.scala:78):
        bit 0 = phased, bits 1-2 = ploidy, bits 3+ = allele repr (the
        diploid genotype index k(k+1)/2+j; phased stores the index of
        (j, j+delta)). Inverse of the encoding native files carry —
        call(0,1) <-> 12, call(1,2, phased) <-> 61."""
        phased = bool(c & 1)
        ploidy = (c >> 1) & 3
        ar = c >> 3
        if ploidy == 0:
            return cls([], phased)
        if ploidy == 1:
            return cls([ar], phased)
        if ploidy != 2:
            raise ValueError(f"unsupported ploidy {ploidy} in call int {c}")
        import math

        k = (math.isqrt(8 * ar + 1) - 1) // 2
        j = ar - k * (k + 1) // 2
        if phased:
            return cls([j, k - j], True)
        return cls([j, k], False)

    def __eq__(self, other):
        return (
            isinstance(other, Call)
            and (self.alleles, self.phased) == (other.alleles, other.phased)
        )

    def __hash__(self):
        return hash((tuple(self.alleles), self.phased))

    def __repr__(self):
        return f"Call(alleles={self.alleles}, phased={self.phased})"

    def __str__(self):
        sep = "|" if self.phased else "/"
        return sep.join(str(a) for a in self.alleles)


class Trio:
    """ref genetics/pedigree.py:8 — proband/father/mother + sex."""

    def __init__(self, s, fam_id=None, pat_id=None, mat_id=None, is_female=None):
        self.s = s
        self.fam_id = fam_id
        self.pat_id = pat_id
        self.mat_id = mat_id
        self._is_female = is_female

    @property
    def is_female(self):
        return self._is_female is True

    @property
    def is_male(self):
        return self._is_female is False

    def is_complete(self) -> bool:
        return self.pat_id is not None and self.mat_id is not None

    def as_dict(self) -> dict:
        return {
            "id": self.s,
            "fam_id": self.fam_id,
            "pat_id": self.pat_id,
            "mat_id": self.mat_id,
            "is_female": self._is_female,
        }

    def __eq__(self, other):
        return isinstance(other, Trio) and self.as_dict() == other.as_dict()

    def __repr__(self):
        return f"Trio({self.as_dict()})"


class Pedigree:
    """ref genetics/pedigree.py:173 — a list of Trios with .fam IO."""

    def __init__(self, trios):
        self._trios = tuple(trios)

    @property
    def trios(self) -> list:
        return list(self._trios)

    def complete_trios(self) -> list:
        return [t for t in self._trios if t.is_complete()]

    def filter_to(self, samples) -> "Pedigree":
        keep = set(samples)
        return Pedigree([t for t in self._trios if t.s in keep])

    @classmethod
    def read(cls, fam_path: str, delimiter: str = r"\s+") -> "Pedigree":
        import re

        trios = []
        with open(fam_path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                fam, kid, dad, mom, sex = re.split(delimiter, line)[:5]
                trios.append(
                    Trio(
                        kid,
                        fam_id=None if fam == "0" else fam,
                        pat_id=None if dad == "0" else dad,
                        mat_id=None if mom == "0" else mom,
                        is_female={"2": True, "1": False}.get(sex),
                    )
                )
        return cls(trios)

    def write(self, path: str) -> None:
        with open(path, "w") as f:
            for t in self._trios:
                sex = {True: "2", False: "1"}.get(t._is_female, "0")
                f.write(
                    "\t".join(
                        [
                            t.fam_id or "0",
                            t.s,
                            t.pat_id or "0",
                            t.mat_id or "0",
                            sex,
                            "0",
                        ]
                    )
                    + "\n"
                )

    def to_fam_df(self, spark):
        """import_fam-shaped DataFrame for the trio/mendel methods."""
        return spark.createDataFrame([t.as_dict() for t in self._trios])

    def __eq__(self, other):
        return isinstance(other, Pedigree) and self._trios == other._trios

    def __repr__(self):
        return f"Pedigree({list(self._trios)})"
