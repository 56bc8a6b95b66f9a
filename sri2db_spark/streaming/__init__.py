from .listener import BroadcastListener
from .stream_sync import stream_sync_from_files

__all__ = ["BroadcastListener", "stream_sync_from_files"]
