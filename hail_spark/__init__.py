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

__all__ = ["get_spark", "Table", "GroupedTable", "asc", "desc", "agg", "hf", "scan"]

__version__ = "0.1.0"
