"""ctypes bindings for the native components (native/).

FStoreReader wraps native/fstore.cc: batched record gather with pread
threads outside the GIL, optional on-the-fly fp16→fp32 widening. Falls
back is handled by the caller (data/feature_store.py keeps a numpy mmap
path); importing this module raises if the shared library isn't built
(`make -C native`).
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _lib():
    global _LIB
    if _LIB is None:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        path = os.path.join(here, "..", "native", "build", "libfstore.so")
        if not os.path.exists(path):
            raise OSError(f"libfstore.so not built at {path} "
                          "(run `make -C native`)")
        lib = ctypes.CDLL(path)
        lib.fstore_open.restype = ctypes.c_int64
        lib.fstore_open.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                    ctypes.c_uint64]
        lib.fstore_gather.restype = ctypes.c_int
        lib.fstore_gather.argtypes = [
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        lib.fstore_close.restype = None
        lib.fstore_close.argtypes = [ctypes.c_int64]
        _LIB = lib
    return _LIB


class FStoreReader:
    """Random-access reader over the ISCF record format (see
    data/feature_store.py for the layout)."""

    def __init__(self, path: str, data_off: int, dtype: np.dtype,
                 rec_elems: int, num_threads: int = 8):
        self.dtype = np.dtype(dtype)
        self.rec_elems = int(rec_elems)
        self.rec_bytes = self.rec_elems * self.dtype.itemsize
        self.widen = int(self.dtype == np.float16)
        self.num_threads = num_threads
        self._h = _lib().fstore_open(path.encode(), data_off,
                                     self.rec_bytes)
        if self._h < 0:
            raise OSError(f"fstore_open failed for {path}")

    @property
    def out_dtype(self):
        return np.float32 if self.widen else self.dtype

    def read(self, idx: int) -> np.ndarray:
        return self.gather(np.asarray([idx], np.int64))[0]

    def gather(self, idxs) -> np.ndarray:
        """[n] indices -> [n, rec_elems] array (fp16 widened to fp32)."""
        idxs = np.ascontiguousarray(idxs, np.int64)
        n = len(idxs)
        out = np.empty((n, self.rec_elems), self.out_dtype)
        rc = _lib().fstore_gather(
            self._h, idxs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, out.ctypes.data_as(ctypes.c_char_p), self.widen,
            self.num_threads)
        if rc != 0:
            raise IOError("fstore_gather failed")
        return out

    def close(self):
        if self._h >= 0:
            _lib().fstore_close(self._h)
            self._h = -1

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
