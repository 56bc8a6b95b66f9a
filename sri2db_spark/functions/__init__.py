from . import (
    dedup,
    doctor,
    layout,
    multimodal,
    pipeline,
    rtbf,
    similarity,
    statestore,
    stats,
    text,
)

__all__ = [
    "dedup",
    "doctor",
    "layout",
    "multimodal",
    "pipeline",
    "rtbf",
    "similarity",
    "statestore",
    "stats",
    "text",
]
