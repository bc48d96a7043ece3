from . import decontam, dedup, multimodal, sampling, scrub, similarity, textstats, tokenizer  # noqa: F401
