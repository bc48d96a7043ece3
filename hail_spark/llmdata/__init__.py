from . import decontam, dedup, multimodal, sampling, scrub, similarity, textstats  # noqa: F401
