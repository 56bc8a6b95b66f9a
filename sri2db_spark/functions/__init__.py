from . import dedup, layout, multimodal, pipeline, similarity, stats, text

__all__ = ["dedup", "layout", "multimodal", "pipeline", "similarity", "stats", "text"]
