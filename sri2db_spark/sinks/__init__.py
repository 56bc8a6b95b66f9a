from .lake import LakeTable

__all__ = ["LakeTable"]
