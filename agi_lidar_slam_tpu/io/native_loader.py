"""ctypes bindings for the native (C++) prefetching scan loader.

Builds io/native/lidar_io.cpp on first use (g++ -O3 -shared) and caches the
.so next to the source. Falls back cleanly if no compiler is available —
callers can use the pure-Python io.kitti loader instead.

Usage:
    with NativeKittiLoader(paths, rings=64, width=1800) as loader:
        for scan in loader:          # yields ScanGrid, prefetched off-thread
            state, res = process_scan(state, scan, cfg)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Sequence

import jax.numpy as jnp
import numpy as np

from ..pointcloud.cloud import ScanGrid

_SRC = os.path.join(os.path.dirname(__file__), "native", "lidar_io.cpp")
_SO = os.path.join(os.path.dirname(__file__), "native", "liblidar_io.so")


def build_native(force: bool = False) -> str:
    """Compile the loader library if missing/stale. Returns the .so path."""
    if (
        not force
        and os.path.exists(_SO)
        and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)
    ):
        return _SO
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


_lib = None


def _load_lib():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build_native())
        lib.loader_create.restype = ctypes.c_void_p
        lib.loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.loader_next.restype = ctypes.c_int64
        lib.loader_next.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 3
        lib.loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


class NativeKittiLoader:
    """Prefetching scan iterator backed by the C++ thread pool."""

    def __init__(
        self,
        paths: Sequence[str],
        rings: int = 64,
        width: int = 1800,
        fov_up: float = 2.0,
        fov_down: float = -24.8,
        min_range: float = 0.5,
        n_threads: int = 3,
        queue_depth: int = 6,
    ):
        self.rings, self.width = rings, width
        lib = _load_lib()
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._lib = lib
        self._h = lib.loader_create(
            arr, len(paths), rings, width,
            ctypes.c_float(fov_up), ctypes.c_float(fov_down),
            ctypes.c_float(min_range), n_threads, queue_depth,
        )
        self._xyz = np.empty((rings, width, 3), dtype=np.float32)
        self._mask = np.empty((rings, width), dtype=np.uint8)
        self._time = np.empty((rings, width), dtype=np.float32)

    def __iter__(self) -> Iterator[ScanGrid]:
        while True:
            idx = self._lib.loader_next(
                self._h,
                self._xyz.ctypes.data_as(ctypes.c_void_p),
                self._mask.ctypes.data_as(ctypes.c_void_p),
                self._time.ctypes.data_as(ctypes.c_void_p),
            )
            if idx < 0:
                return
            # explicit copies: jnp.asarray may alias the host buffer on the CPU
            # backend, and self._xyz is overwritten by the next loader_next
            yield ScanGrid(
                jnp.asarray(self._xyz.copy()),
                jnp.asarray(self._mask.astype(bool)),
                jnp.asarray(self._time.copy()),
            )

    def close(self):
        if self._h:
            self._lib.loader_destroy(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
