from .committer import ManifestCommitter, RenameCommitter
from .fs import LocalFS, ObjectStoreFS
from .lake import LakeTable

__all__ = [
    "LakeTable",
    "LocalFS",
    "ManifestCommitter",
    "ObjectStoreFS",
    "RenameCommitter",
]
