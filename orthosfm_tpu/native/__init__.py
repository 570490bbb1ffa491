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
    srcs = [os.path.join(here, "trackgraph.cpp"),
            os.path.join(here, "trackio.cpp")]
    out = os.path.join(here, "libosfm_native.so")
    newest = max(os.path.getmtime(s) for s in srcs)
    if not os.path.isfile(out) or os.path.getmtime(out) < newest:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", out] + srcs,
            check=True, capture_output=True)
    lib = ctypes.CDLL(out)
    lib.osfm_union_find.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
    lib.osfm_union_find.restype = None
    lib.osfm_tracks_load.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64)]
    lib.osfm_tracks_load.restype = ctypes.c_void_p
    lib.osfm_tracks_fill.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8)]
    lib.osfm_tracks_fill.restype = None
    lib.osfm_tracks_free.argtypes = [ctypes.c_void_p]
    lib.osfm_tracks_free.restype = None
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


def parse_tracks_file(path: str):
    """Parse a tracks.txt via the native reader. Returns flat arrays
    (counts (T,), vid (F,), lid (F,), gid (F,), xy (F, 2), rgb (F, 3)) or
    None when the native lib is absent or the file fails strict parsing."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    n_tracks = ctypes.c_int64(0)
    n_feats = ctypes.c_int64(0)
    handle = lib.osfm_tracks_load(path.encode(), ctypes.byref(n_tracks),
                                  ctypes.byref(n_feats))
    if not handle:
        return None
    try:
        T, F = n_tracks.value, n_feats.value
        counts = np.empty(T, np.int64)
        vid = np.empty(F, np.int32)
        lid = np.empty(F, np.int32)
        gid = np.empty(F, np.int64)
        xy = np.empty((F, 2), np.float32)
        rgb = np.empty((F, 3), np.uint8)
        lib.osfm_tracks_fill(
            handle,
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            vid.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lid.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            gid.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            xy.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return counts, vid, lid, gid, xy, rgb
    finally:
        lib.osfm_tracks_free(handle)
