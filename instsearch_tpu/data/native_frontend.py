"""ctypes bindings for the native C++ frontend (native/frontend.cc).

Auto-builds ``libisf_frontend.so`` on first use (g++ + libjpeg/libpng are
part of the supported environment); falls back to the cv2 host path when
the toolchain or libraries are unavailable. The native loader decodes,
resizes, and crops a whole batch on a std::thread pool — the GIL-free
replacement for the per-image Python loop (SURVEY.md §7: sustaining
extraction throughput is an input-pipeline problem).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libisf_frontend.so"))

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load() -> "ctypes.CDLL | None":
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            # run make unconditionally: it is a no-op when the .so is
            # fresh, and skipping it would silently load a STALE binary
            # after a frontend.cc edit (the Makefile tracks the .cc dep).
            # A make failure (no toolchain on this host) downgrades to
            # loading a prebuilt .so if one exists (ADVICE r2).
            try:
                subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                               check=True, capture_output=True, timeout=120)
            except Exception as e:
                if not os.path.exists(_SO_PATH):
                    raise
                import logging
                logging.getLogger("instsearch.native").warning(
                    "native frontend rebuild failed (%s); loading the "
                    "existing %s — it may be stale", e, _SO_PATH)
            lib = ctypes.CDLL(_SO_PATH)
            lib.isf_load_one.argtypes = [
                ctypes.c_char_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8)]
            lib.isf_load_one.restype = ctypes.c_int
            lib.isf_load_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int]
            lib.isf_load_batch.restype = ctypes.c_int
            _lib = lib
        except Exception:
            _build_failed = True
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def load_batch_native(paths, size: int, n_threads: int = 0
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Decode+resize+crop ``paths`` -> (uint8 [n, size, size, 3], ok [n] bool).

    Failed images have ok=False and zeroed pixels (quarantine upstream).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native frontend unavailable (build failed)")
    n = len(paths)
    out = np.zeros((n, size, size, 3), np.uint8)
    ok = np.zeros((n,), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.isf_load_batch(
        arr, n, size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_threads)
    return out, ok.astype(bool)
