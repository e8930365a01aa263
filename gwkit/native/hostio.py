"""ctypes bindings for the native host-IO runtime (native/hostio.cpp).

Builds the shared library on first use (g++, cached beside the source) and
falls back to numpy implementations if no compiler is available — the
native path is an accelerator, not a requirement.

Fast path used by the search engine: uncompressed, contiguous HDF5 datasets
expose their file offset (h5py ``ds.id.get_offset()``), so month-scale
strain can be streamed by the C++ double-buffered reader with f64->f32
conversion off the Python thread.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native", "hostio.cpp")
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libhostio.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if not os.path.isfile(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB_PATH, _SRC, "-lpthread"],
                check=True, capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            _build_failed = True
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.f64_to_f32.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long]
    lib.extract_windows.argtypes = [ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
                                    ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_void_p]
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [ctypes.c_char_p, ctypes.c_long, ctypes.c_long, ctypes.c_int, ctypes.c_long]
    lib.loader_next.restype = ctypes.c_long
    lib.loader_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    lib.prefetch_create.restype = ctypes.c_void_p
    lib.prefetch_create.argtypes = [ctypes.c_char_p, ctypes.c_long, ctypes.c_long, ctypes.c_int]
    lib.prefetch_wait.restype = ctypes.c_long
    lib.prefetch_wait.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.prefetch_destroy.argtypes = [ctypes.c_void_p]
    return lib


def _get() -> Optional[ctypes.CDLL]:
    global _lib
    with _lock:
        if _lib is None and not _build_failed:
            _lib = _build()
        return _lib


def available() -> bool:
    return _get() is not None


def f64_to_f32(src: np.ndarray) -> np.ndarray:
    lib = _get()
    src = np.ascontiguousarray(src, np.float64)
    if lib is None:
        return src.astype(np.float32)
    dst = np.empty(src.shape, np.float32)
    lib.f64_to_f32(src.ctypes.data, dst.ctypes.data, src.size)
    return dst


def extract_windows(src: np.ndarray, starts: np.ndarray, window: int) -> np.ndarray:
    """(D, N) f32 + starts -> (count, D, window) f32 (host fallback packer)."""
    lib = _get()
    src = np.ascontiguousarray(src, np.float32)
    starts = np.ascontiguousarray(starts, np.int64)
    d, n = src.shape
    if lib is None:
        return np.stack([src[:, s : s + window] for s in starts])
    dst = np.empty((len(starts), d, window), np.float32)
    lib.extract_windows(src.ctypes.data, d, n, starts.ctypes.data, len(starts), window, dst.ctypes.data)
    return dst


class ChunkLoader:
    """Double-buffered background reader of a contiguous on-disk f64/f32 array."""

    def __init__(self, path: str, offset_bytes: int, n_elems: int, on_disk_f64: bool = True,
                 chunk_elems: int = 1 << 22):
        lib = _get()
        if lib is None:
            raise RuntimeError("native hostio unavailable")
        self._lib = lib
        self._chunk = chunk_elems
        self._handle = lib.loader_create(
            path.encode(), offset_bytes, n_elems, 0 if on_disk_f64 else 1, chunk_elems
        )
        if not self._handle:
            raise IOError(f"loader_create failed for {path}")

    def __iter__(self):
        buf = np.empty(self._chunk, np.float32)
        while True:
            got = self._lib.loader_next(self._handle, buf.ctypes.data)
            if got <= 0:
                break
            yield buf[:got].copy()

    def close(self) -> None:
        if self._handle:
            self._lib.loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class ArrayPrefetch:
    """Whole-array C++ background read of a contiguous on-disk f64/f32 array.

    The read runs entirely in a C++ thread (no GIL); ``wait()`` blocks (GIL
    released during the ctypes call) and returns the f32 array. Used by the
    search engine to read segment i+1 while the device scores segment i."""

    def __init__(self, path: str, offset_bytes: int, shape, on_disk_f64: bool):
        lib = _get()
        if lib is None:
            raise RuntimeError("native hostio unavailable")
        self._lib = lib
        self._shape = tuple(shape)
        self._n = int(np.prod(shape))
        self._handle = lib.prefetch_create(
            path.encode(), int(offset_bytes), self._n, 0 if on_disk_f64 else 1)
        if not self._handle:
            raise IOError(f"prefetch_create failed for {path}")

    def wait(self) -> np.ndarray:
        out = np.empty(self._n, np.float32)
        got = self._lib.prefetch_wait(self._handle, out.ctypes.data)
        self.close()
        if got != self._n:
            raise IOError(f"prefetch read {got}/{self._n} elements")
        return out.reshape(self._shape)

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.prefetch_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def dataset_prefetch_meta(dataset) -> Optional[tuple]:
    """(offset_bytes, shape, on_disk_f64) when the dataset is contiguous,
    uncompressed f64/f32 — i.e. native-prefetchable; else None."""
    try:
        offset = dataset.id.get_offset()
    except Exception:
        return None
    if offset is None or dataset.compression is not None:
        return None
    if dataset.dtype == np.float64:
        return int(offset), tuple(dataset.shape), True
    if dataset.dtype == np.float32:
        return int(offset), tuple(dataset.shape), False
    return None


def read_contiguous_dataset(path: str, dataset, chunk_elems: int = 1 << 22) -> Optional[np.ndarray]:
    """Read an h5py dataset via the native loader if it is contiguous and
    uncompressed; returns None when the fast path does not apply."""
    try:
        offset = dataset.id.get_offset()
    except Exception:
        return None
    if offset is None or dataset.compression is not None:
        return None
    if dataset.dtype == np.float64:
        on_disk_f64 = True
    elif dataset.dtype == np.float32:
        # No conversion to hide: h5py's direct read into the target buffer
        # beats the loader's slot->buffer->output copies (measured on the
        # single-core search host); the native path earns its keep on the
        # f64-on-disk challenge files where it converts off-thread.
        return None
    else:
        return None
    if not available():
        return None
    n = int(np.prod(dataset.shape))
    loader = ChunkLoader(path, int(offset), n, on_disk_f64, chunk_elems)
    out = np.empty(n, np.float32)
    pos = 0
    for chunk in loader:
        out[pos : pos + len(chunk)] = chunk
        pos += len(chunk)
    loader.close()
    if pos != n:
        return None
    return out.reshape(dataset.shape)
