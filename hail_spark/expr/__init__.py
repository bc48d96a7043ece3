from . import aggregators, functions  # noqa: F401
