from .vecstore import VecStore, build_native

__all__ = ["VecStore", "build_native"]
