from .listener import BroadcastListener
from .stream_sync import stream_sync_from_files
from .zorder_ingest import stream_zordered_ingest

__all__ = [
    "BroadcastListener",
    "stream_sync_from_files",
    "stream_zordered_ingest",
]
