from . import geo, textfn, vector

__all__ = ["geo", "textfn", "vector"]
