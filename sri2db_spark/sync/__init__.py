from .engine import Sri2DbSync, SyncResult
from .multi import Sri2DbMulti, merge_patch

__all__ = ["Sri2DbSync", "SyncResult", "Sri2DbMulti", "merge_patch"]
