from . import c_api

__all__ = ["c_api"]
