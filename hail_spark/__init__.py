"""hail_spark — a PySpark-native analytics engine with Hail's capabilities.

From-scratch reimplementation of the query surface of hail-is/hail
(reference at /root/reference, v0.2.139) on Spark DataFrames/Catalyst.
See SURVEY.md for the blueprint and per-operator reference citations.
"""

from .session import get_spark
from .table import Table, GroupedTable, asc, desc
from .expr import aggregators as agg
from .expr import functions as hf
from .operators import scans as scan

__all__ = [
    "get_spark", "Table", "GroupedTable", "asc", "desc", "agg", "hf", "scan",
    "MatrixTable", "VariantDataset", "BlockMatrix", "experimental",
]

__version__ = "0.1.0"

_LAZY = {
    "MatrixTable": ("hail_spark.matrixtable", "MatrixTable"),
    "VariantDataset": ("hail_spark.vds", "VariantDataset"),
    "BlockMatrix": ("hail_spark.linalg.blockmatrix", "BlockMatrix"),
    "experimental": ("hail_spark.experimental", None),
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
