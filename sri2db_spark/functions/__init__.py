from . import (
    dedup,
    layout,
    multimodal,
    pipeline,
    similarity,
    statestore,
    stats,
    text,
)

__all__ = [
    "dedup",
    "layout",
    "multimodal",
    "pipeline",
    "similarity",
    "statestore",
    "stats",
    "text",
]
