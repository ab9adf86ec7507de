"""ctypes bindings for the native C++ feature-batch loader.

`NativeFeatureLoader` matches the `Loader` iterator contract over an MS-COCO
feature directory (the `{i}.npy` / `{i}_{k}.npy` / `{i}_seg.npy` file layout,
reference `datasets.py:564-613`) but assembles batches in a C++ thread pool
(`native/fastloader.cpp`): .npy parsing, CHW->HWC transpose, random caption
choice and seg-map min-pooling all run off the GIL.

Builds the shared library on demand with the in-tree Makefile; callers should
fall back to the pure-Python `Loader` when `available()` is False.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libfastloader.so"))

_lib = None


def _load_lib(build: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build:
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True,
                capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.fl_open.restype = ctypes.c_void_p
    lib.fl_open.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
    ]
    lib.fl_next.restype = ctypes.c_int
    lib.fl_next.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 3
    lib.fl_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load_lib() is not None


class NativeFeatureLoader:
    """Infinite batch iterator over a pre-encoded feature directory."""

    def __init__(
        self,
        path: str,
        batch_size: int,
        moments_shape=(8, 32, 32),  # stored CHW
        context_shape=(77, 768),
        seg_in: int = 256,
        mask_size: Optional[int] = 64,  # None disables the panoptic field
        num_captions: int = 5,
        shuffle: bool = True,
        num_threads: int = 4,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
    ):
        """`batch_size` is the GLOBAL batch.  Under `process_count > 1` each
        process samples its local `batch_size / process_count` rows from a
        DISJOINT strided subset of the feature files (so a per-process `seed`
        for the internal shuffle is safe: no sample can appear on two hosts),
        matching the Python `Loader`'s multi-host contract."""
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native fastloader unavailable (build failed?)")
        names = [n for n in os.listdir(path) if n.endswith("_seg.npy")]
        if names:
            indices = sorted(int(n.split("_")[0]) for n in names)
        else:
            indices = sorted(
                int(n[:-4]) for n in os.listdir(path)
                if n.endswith(".npy") and n[:-4].isdigit()
            )
        assert indices, f"no feature files in {path}"
        assert batch_size % process_count == 0, (batch_size, process_count)
        if process_count > 1:
            indices = indices[process_index::process_count]
            batch_size = batch_size // process_count
        assert len(indices) >= batch_size
        self.batch_size = batch_size
        mc, mh, mw = moments_shape
        ct, cd = context_shape
        self._mshape = (batch_size, mh, mw, mc)
        self._cshape = (batch_size, ct, cd)
        self._sshape = (
            (batch_size, mask_size, mask_size, 1) if mask_size else None
        )
        idx_arr = np.asarray(indices, dtype=np.int64)
        self._lib = lib
        self._handle = lib.fl_open(
            path.encode(),
            idx_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx_arr),
            batch_size,
            num_captions,
            mc, mh, mw,
            ct, cd,
            seg_in, mask_size or 0,
            1 if shuffle else 0,
            seed,
            num_threads,
        )
        if not self._handle:
            raise RuntimeError("fl_open failed")

    def __iter__(self) -> Iterator:
        while True:
            batch = self.next()
            if batch is None:
                # Only an explicit close() ends the stream quietly (PEP 479:
                # raising StopIteration inside this generator would surface
                # as 'generator raised StopIteration').
                return
            yield batch

    def next(self):
        """One batch; None after close(); raises on native-side errors
        (bad/missing .npy files — the C side logs the path to stderr)."""
        if not self._handle:
            return None
        moments = np.empty(self._mshape, dtype=np.float32)
        context = np.empty(self._cshape, dtype=np.float32)
        seg = np.empty(self._sshape, dtype=np.int32) if self._sshape else None
        ok = self._lib.fl_next(
            self._handle,
            moments.ctypes.data_as(ctypes.c_void_p),
            context.ctypes.data_as(ctypes.c_void_p),
            seg.ctypes.data_as(ctypes.c_void_p) if seg is not None else None,
        )
        if not ok:
            if not self._handle or getattr(self, "_closing", False):
                return None  # closed (possibly concurrently)
            raise RuntimeError(
                "native fastloader failed (bad or missing feature file — "
                "see stderr for the path)"
            )
        if seg is None:
            return moments, context
        return moments, context, seg

    def close(self):
        if getattr(self, "_handle", None):
            self._closing = True  # lets a concurrent next() see a clean stop
            self._lib.fl_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
