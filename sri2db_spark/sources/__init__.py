from .sri_api import SriApiReader, set_expand_on_path

__all__ = ["SriApiReader", "set_expand_on_path"]
