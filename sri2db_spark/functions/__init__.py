from . import dedup, layout, multimodal, similarity, text

__all__ = ["dedup", "layout", "multimodal", "similarity", "text"]
