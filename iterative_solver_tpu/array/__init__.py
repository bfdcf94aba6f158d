from .basis_store import BasisStore
from .distribution import Distribution, spread_remainder
from . import vector_ops

__all__ = ["BasisStore", "Distribution", "spread_remainder", "vector_ops"]
