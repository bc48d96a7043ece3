from . import scans  # noqa: F401
