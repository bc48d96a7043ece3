from . import decontam, dedup, multimodal, sampling, similarity, textstats  # noqa: F401
