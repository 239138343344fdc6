"""Loader for the optional native (C++) ingest accelerators.

The hot host-side cost of this framework is BGZF inflation + BAM record
decode (the role htslib plays for the reference). csrc/ contains a small C++
library exposing a C ABI consumed here via ctypes. Everything degrades
gracefully to the pure-Python implementations when the library has not been
built.
"""
from __future__ import annotations

import ctypes
import os

_LIB = None
_TRIED = False


def _lib_path() -> str:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(here, "csrc", "build", "libmdtpu_native.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.mdtpu_bgzf_bound.restype = ctypes.c_int64
        lib.mdtpu_bgzf_bound.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.mdtpu_bgzf_decompress.restype = ctypes.c_int64
        lib.mdtpu_bgzf_decompress.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_int,
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def bgzf_decompress(data: bytes) -> bytes:
    lib = _load()
    bound = lib.mdtpu_bgzf_bound(data, len(data))
    if bound < 0:
        raise ValueError("malformed BGZF stream")
    out = ctypes.create_string_buffer(bound)
    n = lib.mdtpu_bgzf_decompress(data, len(data), out, bound, os.cpu_count() or 1)
    if n < 0:
        raise ValueError("BGZF inflation failed")
    return out.raw[:n]
