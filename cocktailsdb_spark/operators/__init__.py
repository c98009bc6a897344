from . import dedup, events, multimodal, similarity, text  # noqa: F401
