"""hail_spark — a PySpark-native analytics engine with Hail's capabilities.

From-scratch reimplementation of the query surface of hail-is/hail
(reference at /root/reference, v0.2.139) on Spark DataFrames/Catalyst.
See SURVEY.md for the blueprint and per-operator reference citations.
"""

from .session import get_spark, init, init_local, init_spark, spark_context, stop, tmp_dir
from .table import Table, GroupedTable, asc, desc
from .expr import aggregators as agg
from .expr import functions as hf
from .operators import scans as scan

__all__ = [
    "get_spark", "Table", "GroupedTable", "asc", "desc", "agg", "hf", "scan",
    "MatrixTable", "GroupedMatrixTable", "VariantDataset", "BlockMatrix",
    "experimental", "init", "init_spark", "init_local", "stop",
    "spark_context", "tmp_dir", "version", "citation",
    "set_global_seed", "reset_global_randomness",
    "get_reference", "default_reference",
    "nd", "linalg", "methods", "genetics", "stats", "vds", "utils", "io",
    "hadoop_open", "hadoop_exists", "hadoop_is_file", "hadoop_is_dir",
    "hadoop_ls", "hadoop_stat", "hadoop_copy", "hadoop_scheme_supported",
    "TemporaryDirectory", "TemporaryFilename",
]

__version__ = "0.1.0"


def version() -> str:
    """Parity alias for hl.version()."""
    return __version__


def citation(*, bibtex: bool = False) -> str:
    """Parity alias for hl.citation/cite_hail: cite the REFERENCE
    project this engine reimplements (we add no citable method of our
    own)."""
    if bibtex:
        return (
            "@misc{hail, author = {Hail Team}, title = {Hail},"
            " howpublished = {\\url{https://github.com/hail-is/hail}}}"
        )
    return "Hail Team. Hail. https://github.com/hail-is/hail"


_LAZY = {
    "MatrixTable": ("hail_spark.matrixtable", "MatrixTable"),
    "GroupedMatrixTable": ("hail_spark.matrixtable", "GroupedMatrixCols"),
    "VariantDataset": ("hail_spark.vds", "VariantDataset"),
    "BlockMatrix": ("hail_spark.linalg.blockmatrix", "BlockMatrix"),
    "experimental": ("hail_spark.experimental", None),
    # submodule parity handles (ref hl.nd / hl.linalg / hl.methods ...)
    "nd": ("hail_spark.expr.ndarray", None),
    "linalg": ("hail_spark.linalg.blockmatrix", None),
    "methods": ("hail_spark.methods", None),
    "genetics": ("hail_spark.methods.genetics", None),
    "stats": ("hail_spark.expr.stats", None),
    "vds": ("hail_spark.vds", None),
    "utils": ("hail_spark.utils", None),
    "io": ("hail_spark.io", None),
    # randomness + genome registry (ref hl.set_global_seed etc.)
    "set_global_seed": ("hail_spark.expr.functions", "set_global_seed"),
    "reset_global_randomness": ("hail_spark.expr.functions", "reset_global_randomness"),
    "get_reference": ("hail_spark.expr.genome", "get_reference"),
    "default_reference": ("hail_spark.expr.genome", "default_reference"),
    # filesystem utils (ref hl.hadoop_*)
    "hadoop_open": ("hail_spark.utils", "hadoop_open"),
    "hadoop_exists": ("hail_spark.utils", "hadoop_exists"),
    "hadoop_is_file": ("hail_spark.utils", "hadoop_is_file"),
    "hadoop_is_dir": ("hail_spark.utils", "hadoop_is_dir"),
    "hadoop_ls": ("hail_spark.utils", "hadoop_ls"),
    "hadoop_stat": ("hail_spark.utils", "hadoop_stat"),
    "hadoop_copy": ("hail_spark.utils", "hadoop_copy"),
    "hadoop_scheme_supported": ("hail_spark.utils", "hadoop_scheme_supported"),
    "TemporaryDirectory": ("hail_spark.utils", "TemporaryDirectory"),
    "TemporaryFilename": ("hail_spark.utils", "TemporaryFilename"),
}


def __getattr__(name: str):
    """Lazy top-level exports — heavier submodules (numpy/pandas users)
    load on first touch, keeping bare `import hail_spark` light."""
    if name in _LAZY:
        import importlib

        mod_name, attr = _LAZY[name]
        mod = importlib.import_module(mod_name)
        return mod if attr is None else getattr(mod, attr)
    raise AttributeError(f"module 'hail_spark' has no attribute '{name}'")
