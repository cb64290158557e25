"""ctypes bindings for the native (C++) runtime components.

The compute path is JAX/XLA; the runtime around it — here, the .klg frame
decoder with its background prefetch thread (native/klg_loader.cpp) — is
native, mirroring the reference's C++ readers. Falls back cleanly when the
library has not been built (`make -C native`); builds it on first use when a
toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libmmf_native.so"))
_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.klg_open.restype = ctypes.c_void_p
    lib.klg_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    lib.klg_num_frames.restype = ctypes.c_int
    lib.klg_num_frames.argtypes = [ctypes.c_void_p]
    lib.klg_next.restype = ctypes.c_int
    lib.klg_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.klg_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeKlgReader:
    """Prefetching .klg reader backed by the C++ loader."""

    def __init__(self, path: str, width: int, height: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable (make -C native)")
        self._lib = lib
        self._handle = lib.klg_open(path.encode(), width, height)
        if not self._handle:
            raise IOError(f"cannot open {path}")
        self.width, self.height = width, height
        self.num_frames = lib.klg_num_frames(self._handle)

    def __len__(self) -> int:
        return self.num_frames

    def frames(self) -> Iterator[tuple]:
        n = self.width * self.height
        while True:
            ts = ctypes.c_int64()
            depth = np.empty((self.height, self.width), np.float32)
            rgb = np.empty((self.height, self.width, 3), np.uint8)
            ok = self._lib.klg_next(
                self._handle,
                ctypes.byref(ts),
                depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            )
            if not ok:
                return
            yield int(ts.value), depth, rgb

    def close(self):
        if self._handle:
            self._lib.klg_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
