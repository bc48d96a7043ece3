from .blockmatrix import BlockMatrix  # noqa: F401
