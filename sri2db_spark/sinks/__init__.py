from .committer import ManifestCommitter, RenameCommitter
from .lake import LakeTable

__all__ = ["LakeTable", "ManifestCommitter", "RenameCommitter"]
