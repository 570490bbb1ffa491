"""Native (C++) host-runtime components, loaded via ctypes.

Compiled on first use with the system g++; every consumer has a pure-Python
fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_lock = threading.Lock()
_lib = None
_tried = False


def _build_and_load():
    here = os.path.dirname(__file__)
    src = os.path.join(here, "trackgraph.cpp")
    out = os.path.join(here, "libtrackgraph.so")
    if not os.path.isfile(out) or os.path.getmtime(out) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", out, src],
            check=True, capture_output=True)
    lib = ctypes.CDLL(out)
    lib.osfm_union_find.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
    lib.osfm_union_find.restype = None
    return lib


def get_lib():
    """The native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if not _tried:
            _tried = True
            try:
                _lib = _build_and_load()
            except Exception:  # noqa: BLE001 — fall back to pure Python
                _lib = None
        return _lib


def union_find(edges_a, edges_b, n: int):
    """Roots (n,) after unioning all edges; None if the native lib is absent."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    ea = np.ascontiguousarray(edges_a, np.int64)
    eb = np.ascontiguousarray(edges_b, np.int64)
    out = np.empty(n, np.int64)
    lib.osfm_union_find(
        ea.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        eb.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(ea), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out
