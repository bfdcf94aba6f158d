"""ctypes wrapper for the native vecstore library (native/vecstore.cpp).

Builds the shared library on first use with g++ (no pybind11 in this image;
the C ABI + ctypes is the binding layer, mirroring how the reference exposes
IterativeSolverC.h to Fortran/Python). The compiled .so is cached next to
the source and rebuilt when the source hash changes.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native", "vecstore.cpp")
_BUILD_DIR = os.path.join(os.path.dirname(_SRC), "build")

_lib = None


def build_native() -> str:
    """Compile (if needed) and return the path of the shared library."""
    os.makedirs(_BUILD_DIR, exist_ok=True)
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_BUILD_DIR, f"libvecstore-{digest}.so")
    if not os.path.exists(so_path):
        cmd = [
            "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
            "-pthread", _SRC, "-o", so_path,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
    return so_path


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(build_native())
    i64 = ctypes.c_int64
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int64)
    lib.vecstore_create.restype = ctypes.c_void_p
    lib.vecstore_create.argtypes = [i64, i64, ctypes.c_char_p]
    lib.vecstore_destroy.argtypes = [ctypes.c_void_p]
    lib.vecstore_capacity.restype = i64
    lib.vecstore_capacity.argtypes = [ctypes.c_void_p]
    lib.vecstore_row_len.restype = i64
    lib.vecstore_row_len.argtypes = [ctypes.c_void_p]
    lib.vecstore_put.restype = ctypes.c_int
    lib.vecstore_put.argtypes = [ctypes.c_void_p, i64, dp]
    lib.vecstore_get.restype = ctypes.c_int
    lib.vecstore_get.argtypes = [ctypes.c_void_p, i64, dp]
    lib.vecstore_gemm_inner.restype = ctypes.c_int
    lib.vecstore_gemm_inner.argtypes = [ctypes.c_void_p, dp, i64, ip, i64, dp]
    lib.vecstore_gemm_outer.restype = ctypes.c_int
    lib.vecstore_gemm_outer.argtypes = [ctypes.c_void_p, dp, i64, ip, i64, dp]
    lib.vecstore_axpy.restype = ctypes.c_int
    lib.vecstore_axpy.argtypes = [ctypes.c_void_p, i64, ctypes.c_double, dp]
    lib.vecstore_scal.restype = ctypes.c_int
    lib.vecstore_scal.argtypes = [ctypes.c_void_p, i64, ctypes.c_double]
    lib.vecstore_dot.restype = ctypes.c_double
    lib.vecstore_dot.argtypes = [ctypes.c_void_p, i64, i64, ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return lib


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class VecStore:
    """Host/disk tier for basis-vector histories.

    Same contract as the device BasisStore (put/get/gram/combine) but rows
    live in a file and the block numerics stream through the native
    double-buffered pipeline — the TPU-era DistrArrayFile.
    """

    def __init__(self, capacity: int, row_len: int, path: Optional[str] = None):
        self._lib = _load()
        self._h = self._lib.vecstore_create(
            capacity, row_len, path.encode() if path else None
        )
        if not self._h:
            raise OSError("vecstore_create failed")
        self.capacity = capacity
        self.row_len = row_len
        self._free = list(range(capacity - 1, -1, -1))

    def close(self):
        if getattr(self, "_h", None):
            self._lib.vecstore_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    # -- slot management (parity with BasisStore) -----------------------
    def alloc(self) -> int:
        if not self._free:
            raise RuntimeError("VecStore full")
        return self._free.pop()

    def release(self, slot: int) -> None:
        self._free.append(slot)

    def append(self, vec) -> int:
        slot = self.alloc()
        self.put(slot, vec)
        return slot

    # -- IO --------------------------------------------------------------
    def put(self, slot: int, vec) -> None:
        arr = np.ascontiguousarray(np.asarray(vec, dtype=np.float64))
        assert arr.size == self.row_len
        rc = self._lib.vecstore_put(self._h, slot, _dptr(arr))
        if rc != 0:
            raise OSError(f"vecstore_put failed rc={rc}")

    def get(self, slot: int) -> np.ndarray:
        out = np.empty(self.row_len, dtype=np.float64)
        rc = self._lib.vecstore_get(self._h, slot, _dptr(out))
        if rc != 0:
            raise OSError(f"vecstore_get failed rc={rc}")
        return out

    # -- streamed block numerics ----------------------------------------
    def gram(self, x, slots: Sequence[int]) -> np.ndarray:
        """(m, n) x rows(slots)^T -> (m, k), streamed with prefetch."""
        x = np.ascontiguousarray(np.asarray(x, dtype=np.float64))
        if x.ndim == 1:
            x = x[None, :]
        m = x.shape[0]
        k = len(slots)
        out = np.zeros((m, k), dtype=np.float64)
        if k == 0:
            return out
        slots_arr = np.ascontiguousarray(np.asarray(slots, dtype=np.int64))
        rc = self._lib.vecstore_gemm_inner(
            self._h, _dptr(x), m,
            slots_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), k, _dptr(out),
        )
        if rc != 0:
            raise OSError(f"vecstore_gemm_inner failed rc={rc}")
        return out

    def combine(self, coeff, slots: Sequence[int]) -> np.ndarray:
        """coeff (m, k) @ rows(slots) -> (m, n), streamed with prefetch."""
        coeff = np.ascontiguousarray(np.asarray(coeff, dtype=np.float64))
        if coeff.ndim == 1:
            coeff = coeff[None, :]
        m = coeff.shape[0]
        k = len(slots)
        out = np.zeros((m, self.row_len), dtype=np.float64)
        if k == 0:
            return out
        slots_arr = np.ascontiguousarray(np.asarray(slots, dtype=np.int64))
        rc = self._lib.vecstore_gemm_outer(
            self._h, _dptr(coeff), m,
            slots_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), k, _dptr(out),
        )
        if rc != 0:
            raise OSError(f"vecstore_gemm_outer failed rc={rc}")
        return out

    def axpy(self, slot: int, alpha: float, vec) -> None:
        arr = np.ascontiguousarray(np.asarray(vec, dtype=np.float64))
        rc = self._lib.vecstore_axpy(self._h, slot, float(alpha), _dptr(arr))
        if rc != 0:
            raise OSError(f"vecstore_axpy failed rc={rc}")

    def scale(self, slot: int, alpha: float) -> None:
        rc = self._lib.vecstore_scal(self._h, slot, float(alpha))
        if rc != 0:
            raise OSError(f"vecstore_scal failed rc={rc}")

    def dot(self, slot_a: int, slot_b: int) -> float:
        status = ctypes.c_int(0)
        val = self._lib.vecstore_dot(self._h, slot_a, slot_b, ctypes.byref(status))
        if status.value != 0:
            raise OSError("vecstore_dot failed")
        return float(val)
