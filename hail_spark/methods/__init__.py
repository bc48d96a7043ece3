from . import qc  # noqa: F401
