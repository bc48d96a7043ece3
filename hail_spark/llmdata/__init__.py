from . import dedup, multimodal, sampling, similarity, textstats  # noqa: F401
