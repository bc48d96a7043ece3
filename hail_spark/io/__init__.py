from .impex import (
    export_elasticsearch,
    export_gen,
    grep,
    import_avro,
    import_jsonl,
    export_jsonl,
    import_bed,
    import_fam,
    import_gen,
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
    "import_gen",
    "export_gen",
    "import_avro",
    "import_jsonl",
    "export_jsonl",
    "export_elasticsearch",
    "import_vcf",
    "export_vcf",
]
