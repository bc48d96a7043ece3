from . import dedup, similarity, textstats  # noqa: F401
