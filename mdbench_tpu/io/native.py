"""ctypes bindings for the native (C++) data loader.

The reference's reader layer is native C (atom.c readAtom_*); this build
keeps the compute path in JAX/Pallas and implements the host runtime's
hot IO in C++ (native/fast_readers.cpp), compiled on demand with g++ and
cached next to the source. Falls back silently to the pure-Python
readers when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "fast_readers.cpp",
)
_SO = os.path.join(os.path.dirname(_SRC), "libfastread.so")


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            ):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_SO)
            for fn in (lib.parse_dmp, lib.parse_in):
                fn.restype = ctypes.c_long
                fn.argtypes = [
                    ctypes.c_char_p,
                    np.ctypeslib.ndpointer(np.float64, flags="C"),
                    np.ctypeslib.ndpointer(np.float64, flags="C"),
                    np.ctypeslib.ndpointer(np.int32, flags="C"),
                    np.ctypeslib.ndpointer(np.float64, flags="C"),
                    ctypes.c_long,
                ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


_W_SRC = os.path.join(os.path.dirname(_SRC), "fast_writers.cpp")
_W_SO = os.path.join(os.path.dirname(_SRC), "libfastwrite.so")
_wlib = None
_wtried = False


def _load_writers():
    global _wlib, _wtried
    with _lock:
        if _wtried:
            return _wlib
        _wtried = True
        try:
            if not os.path.exists(_W_SO) or (
                os.path.getmtime(_W_SO) < os.path.getmtime(_W_SRC)
            ):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _W_SO, _W_SRC],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_W_SO)
            lib.write_atoms_vtk.restype = ctypes.c_int
            lib.write_atoms_vtk.argtypes = [
                ctypes.c_char_p,
                np.ctypeslib.ndpointer(np.float64, flags="C"),
                ctypes.c_long,
            ]
            ii = np.ctypeslib.ndpointer(np.int32, flags="C")
            lib.write_index_trace.restype = ctypes.c_int
            lib.write_index_trace.argtypes = [
                ctypes.c_char_p, ii, ii,
                ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ]
            lib.write_mem_trace.restype = ctypes.c_int
            lib.write_mem_trace.argtypes = [
                ctypes.c_char_p, ii, ii,
                ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ]
            _wlib = lib
        except Exception:
            _wlib = None
        return _wlib


def write_atoms_vtk(path: str, x: np.ndarray) -> bool:
    """Native VTK atom dump; returns False -> caller uses Python path."""
    lib = _load_writers()
    if lib is None:
        return False
    xc = np.ascontiguousarray(x, np.float64)
    return lib.write_atoms_vtk(path.encode(), xc.reshape(-1), len(xc)) == 0


def write_index_trace(path: str, neighbors, numneigh, vw: int) -> bool:
    lib = _load_writers()
    if lib is None:
        return False
    nb = np.ascontiguousarray(neighbors, np.int32)
    nn = np.ascontiguousarray(numneigh, np.int32)
    return lib.write_index_trace(
        path.encode(), nb, nn, nb.shape[0], nb.shape[1], vw
    ) == 0


def write_mem_trace(path: str, neighbors, numneigh, nlocal: int,
                    nrows: int, float_size: int) -> bool:
    lib = _load_writers()
    if lib is None:
        return False
    nb = np.ascontiguousarray(neighbors, np.int32)
    nn = np.ascontiguousarray(numneigh, np.int32)
    return lib.write_mem_trace(
        path.encode(), nb, nn, nlocal, nb.shape[1], nrows, float_size
    ) == 0


def available() -> bool:
    return _load() is not None


def _count_atoms_dmp(path: str) -> int:
    with open(path) as fp:
        for line in fp:
            if line.startswith("ITEM: NUMBER OF ATOMS"):
                return int(fp.readline())
    raise ValueError("no NUMBER OF ATOMS item")


def _count_atoms_in(path: str) -> int:
    with open(path) as fp:
        return int(fp.readline().split()[0])


def parse(path: str, kind: str):
    """Parse with the native loader. Returns (x, v, types, box) or None
    when the library is unavailable or parsing fails (caller falls back
    to the Python reader)."""
    lib = _load()
    if lib is None:
        return None
    try:
        n = _count_atoms_dmp(path) if kind == "dmp" else _count_atoms_in(path)
    except Exception:
        return None
    x = np.zeros((n, 3), np.float64)
    v = np.zeros((n, 3), np.float64)
    types = np.zeros(n, np.int32)
    box = np.zeros(3, np.float64)
    fn = lib.parse_dmp if kind == "dmp" else lib.parse_in
    got = fn(path.encode(), x.reshape(-1), v.reshape(-1), types, box, n)
    if got != n:
        return None
    return x, v, types, tuple(box)
