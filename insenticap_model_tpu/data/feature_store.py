"""Image-feature stores.

The reference stores ResNet features in HDF5 files keyed by image filename
(preprocess.py:33-45) and RE-OPENS the files in every __getitem__
(dataloader.py:173-174) — a per-sample syscall storm. Here:

  * H5FeatureStore — reads the same HDF5 format (drop-in for existing
    artifacts), one handle per worker thread;
  * MemoryFeatureStore — dict-backed, for tests/small runs;
  * NativeFeatureStore — the TPU-era default: a flat mmap'd record file with
    an index header, written once, served zero-copy by the C++ reader in
    native/fstore (ctypes-bound; see utils/native.py). Batched gather with a
    thread pool saturates host memory bandwidth instead of h5py's
    per-dataset locking.

All stores expose get(fn) -> np.ndarray and batch(fns) -> np.ndarray.
"""
from __future__ import annotations

import json
import os
import struct
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Sequence

import numpy as np

MAGIC = b"ISCF0001"


class FeatureStore:
    def get(self, fn: str) -> np.ndarray:
        raise NotImplementedError

    def batch(self, fns: Sequence[str]) -> np.ndarray:
        return np.stack([self.get(fn) for fn in fns])

    def keys(self) -> List[str]:
        raise NotImplementedError

    def close(self):
        pass


class MemoryFeatureStore(FeatureStore):
    def __init__(self, data: Dict[str, np.ndarray]):
        self._data = data

    def get(self, fn):
        return self._data[fn]

    def keys(self):
        return list(self._data.keys())


class H5FeatureStore(FeatureStore):
    """Reads the reference's <dataset>_fc.h5 / <dataset>_att.h5 files.
    One h5py handle per thread (h5py handles are not thread-safe)."""

    def __init__(self, path: str):
        self.path = path
        self._local = threading.local()

    def _handle(self):
        if not hasattr(self._local, "f"):
            import h5py
            self._local.f = h5py.File(self.path, "r")
        return self._local.f

    def get(self, fn):
        return np.asarray(self._handle()[fn])

    def keys(self):
        return list(self._handle().keys())

    def close(self):
        if hasattr(self._local, "f"):
            self._local.f.close()


# ---------------------------------------------------------------------------
# Native record store (format written here, read by C++ or numpy-mmap)
# ---------------------------------------------------------------------------
# layout: MAGIC | u64 index_len | index_json | raw float16/float32 records
# index_json: {"dtype": "...", "shape": [...], "entries": {fn: offset_idx}}
# All records share one shape/dtype -> the data region is one big tensor.

def write_native_store(path: str, data_iter, shape, dtype="float16",
                       count_hint: Optional[int] = None) -> None:
    """data_iter yields (fn, np.ndarray of `shape`)."""
    entries = {}
    tmp = path + ".tmp"
    rec_size = int(np.prod(shape)) * np.dtype(dtype).itemsize
    with open(tmp, "wb") as f:
        # placeholder header; rewritten at the end
        f.write(MAGIC)
        f.write(struct.pack("<Q", 0))
        data_start = f.tell()
        idx = 0
        for fn, arr in data_iter:
            arr = np.ascontiguousarray(arr, dtype=dtype)
            assert arr.shape == tuple(shape), (arr.shape, shape)
            f.write(arr.tobytes())
            entries[fn] = idx
            idx += 1
    index = json.dumps({"dtype": dtype, "shape": list(shape),
                        "entries": entries}).encode()
    # rewrite with the real header before the data
    final = path + ".tmp2"
    with open(final, "wb") as out, open(tmp, "rb") as src:
        out.write(MAGIC)
        out.write(struct.pack("<Q", len(index)))
        out.write(index)
        src.seek(data_start)
        while True:
            chunk = src.read(1 << 24)
            if not chunk:
                break
            out.write(chunk)
    os.remove(tmp)
    os.replace(final, path)
    _ = rec_size, count_hint


class NativeFeatureStore(FeatureStore):
    """mmap-backed random access; batch() gathers with a thread pool.
    Uses the C++ reader (native/fstore) when built, else numpy mmap —
    identical format either way."""

    def __init__(self, path: str, num_threads: int = 8,
                 out_dtype=np.float32):
        self.path = path
        with open(path, "rb") as f:
            magic = f.read(8)
            if magic != MAGIC:
                raise ValueError(f"{path}: bad magic {magic!r}")
            (ilen,) = struct.unpack("<Q", f.read(8))
            index = json.loads(f.read(ilen).decode())
            self._data_off = f.tell()
        self.dtype = np.dtype(index["dtype"])
        self.shape = tuple(index["shape"])
        self.entries: Dict[str, int] = index["entries"]
        self._rec_elems = int(np.prod(self.shape))
        self._mm = np.memmap(path, mode="r", dtype=self.dtype,
                             offset=self._data_off)
        self.out_dtype = out_dtype
        self._pool = ThreadPoolExecutor(num_threads) if num_threads else None
        self._native = None
        try:
            from ..utils.native import FStoreReader
            self._native = FStoreReader(path, self._data_off, self.dtype,
                                        self._rec_elems)
        except Exception:
            self._native = None  # numpy mmap fallback

    def get(self, fn):
        idx = self.entries[fn]
        if self._native is not None:
            rec = self._native.read(idx)
        else:
            rec = self._mm[idx * self._rec_elems:(idx + 1) * self._rec_elems]
        return np.asarray(rec, dtype=self.out_dtype).reshape(self.shape)

    def batch(self, fns: Sequence[str]) -> np.ndarray:
        if self._native is not None:
            # one C call: threaded pread gather + fp16 widening, no GIL
            idxs = np.asarray([self.entries[fn] for fn in fns], np.int64)
            flat = self._native.gather(idxs)
            return np.asarray(flat, self.out_dtype).reshape(
                (len(fns),) + self.shape)
        out = np.empty((len(fns),) + self.shape, self.out_dtype)
        if self._pool is None:
            for i, fn in enumerate(fns):
                out[i] = self.get(fn)
            return out

        def fill(i_fn):
            i, fn = i_fn
            out[i] = self.get(fn)
        list(self._pool.map(fill, enumerate(fns)))
        return out

    def keys(self):
        return list(self.entries.keys())


def open_store(path: str) -> FeatureStore:
    """Sniff format: native store magic vs HDF5."""
    with open(path, "rb") as f:
        magic = f.read(8)
    if magic == MAGIC:
        return NativeFeatureStore(path)
    return H5FeatureStore(path)
