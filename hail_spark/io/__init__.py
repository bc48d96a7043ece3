from .impex import (
    grep,
    import_bed,
    import_fam,
    import_lines,
    import_locus_intervals,
    import_table,
)
from .vcf import export_vcf, import_vcf

__all__ = [
    "import_table",
    "import_lines",
    "grep",
    "import_bed",
    "import_locus_intervals",
    "import_fam",
    "import_vcf",
    "export_vcf",
]
