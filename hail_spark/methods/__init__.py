"""Method library package — re-exports the reference's
``hail.methods.__init__`` surface (hail/python/hail/methods/__init__.py
``__all__``) from this engine's submodules, so
``hail_spark.methods.<name>`` resolves for every name a reference user
would reach via ``hl.methods.<name>`` / ``hl.<name>``.

ggplot/plot live out of engine scope (SURVEY §2.12); linear-mixed-model
entry points are reference-parity stubs (removed upstream in 0.2.94).
"""

from . import qc  # noqa: F401
from .annotate import (  # noqa: F401
    VEPConfig,
    VEPConfigGRCh37Version85,
    VEPConfigGRCh38Version95,
    nirvana,
    vep,
    vep_json_typ,
)
from .genetics import (  # noqa: F401
    balding_nichols_model,
    concordance,
    de_novo,
    de_novo_candidates,
    filter_alleles,
    filter_alleles_hts,
    impute_sex,
    mendel_errors,
    split_multi,
    split_multi_hts,
    transmission_disequilibrium_test,
    trio_matrix,
)
from .misc import (  # noqa: F401
    filter_intervals,
    lambda_gc,
    ld_matrix,
    ld_prune,
    maximal_independent_set,
    rename_duplicates,
    segment_intervals,
)
from .qc import compute_charr, sample_qc, summarize_variants, variant_qc  # noqa: F401
from .relatedness import (  # noqa: F401
    genetic_relatedness_matrix,
    identity_by_descent,
    king,
    pc_relate,
    realized_relationship_matrix,
    row_correlation,
    simulate_random_mating,
)
from .statgen import (  # noqa: F401
    _blanczos_pca,
    _hwe_normalized_blanczos,
    _linear_regression_rows_nd,
    _linear_skat,
    _logistic_regression_rows_nd,
    _logistic_skat,
    _pca_and_moments,
    _spectral_moments,
    hwe_normalized_pca,
    linear_mixed_model,
    linear_mixed_regression_rows,
    linear_regression_rows,
    linear_skat,
    logistic_regression_rows,
    logistic_skat,
    pca,
    poisson_regression_rows,
    skat,
)
from ..io.bgen import export_bgen, import_bgen, index_bgen  # noqa: F401
from ..io.gvcf import import_gvcf_interval  # noqa: F401
from ..io.impex import (  # noqa: F401
    export_elasticsearch,
    export_gen,
    get_vcf_header_info,
    get_vcf_metadata,
    grep,
    export_jsonl,
    import_avro,
    import_bed,
    import_csv,
    import_fam,
    import_gen,
    import_jsonl,
    import_lines,
    import_locus_intervals,
    import_matrix_table,
    import_table,
)
from ..io.plink import export_plink, import_plink  # noqa: F401
from ..io.vcf import export_vcf, import_vcf  # noqa: F401


def read_table(spark, path):
    """Native-format table read (ref hl.read_table): the parquet +
    key-metadata layout Table.write produces. A directory written by
    the REFERENCE engine (.ht with metadata.json.gz TableSpec) is
    auto-detected and decoded by io/hail_native.py — the migration
    on-ramp for existing Hail tables."""
    import os

    from ..table import Table

    if os.path.exists(os.path.join(path, "metadata.json.gz")):
        from ..io.hail_native import read_table as _ref_read

        return _ref_read(spark, path)
    return Table.read(spark, path)


def read_matrix_table(spark, path):
    """Native-format matrix read (ref hl.read_matrix_table); reference-
    written .mt directories auto-detected like read_table."""
    import os

    from ..matrixtable import MatrixTable

    if os.path.exists(os.path.join(path, "metadata.json.gz")):
        from ..io.hail_native import read_matrix_table as _ref_read

        return _ref_read(spark, path)
    return MatrixTable.read(spark, path)
