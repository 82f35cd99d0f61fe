"""Native (C++) runtime components, loaded via ctypes.

Where the reference uses native code for its runtime (DBoW2's vocabulary
loader, g2o's solvers), the TPU build keeps the COMPUTE on the device but
provides native host components where Python is the wrong tool:
  * vocab_parser: mmap-based DBoW2 text-vocabulary parser (the reference's
    loadFromTextFile takes minutes on ORBvoc.txt; this is seconds).

Libraries compile on first use with g++ -O3 and are cached next to the
sources; every entry point has a pure-Python fallback."""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))


def _build(name: str) -> str | None:
    src = os.path.join(_DIR, f"{name}.cpp")
    lib = os.path.join(_DIR, f"lib{name}.so")
    if os.path.exists(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
        return lib
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", lib, src],
            check=True, capture_output=True, timeout=120,
        )
        return lib
    except Exception:
        return None


_vocab_lib = None


def load_vocab_parser():
    """Returns the ctypes vocab parser lib, or None if unavailable."""
    global _vocab_lib
    if _vocab_lib is None:
        path = _build("vocab_parser")
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.vocab_count_nodes.restype = ctypes.c_int
        lib.vocab_count_nodes.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.vocab_parse.restype = ctypes.c_int
        lib.vocab_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        _vocab_lib = lib
    return _vocab_lib


def parse_vocab_text(path: str):
    """Parse a DBoW2 text vocabulary natively.

    Returns (k, L, parent [n] i32, is_leaf [n] u8, desc [n+1, 32] u8,
    weight [n] f32) with 1-based node ids (row 0 of desc = root), or None
    if the native lib is unavailable."""
    import numpy as np

    lib = load_vocab_parser()
    if lib is None:
        return None
    k = ctypes.c_int()
    L = ctypes.c_int()
    n = lib.vocab_count_nodes(path.encode(), ctypes.byref(k), ctypes.byref(L))
    if n < 0:
        return None
    parent = np.zeros(n, np.int32)
    is_leaf = np.zeros(n, np.uint8)
    desc = np.zeros((n + 1, 32), np.uint8)
    weight = np.zeros(n, np.float32)
    rc = lib.vocab_parse(
        path.encode(), n, k.value,
        parent.ctypes.data_as(ctypes.c_void_p),
        is_leaf.ctypes.data_as(ctypes.c_void_p),
        desc.ctypes.data_as(ctypes.c_void_p),
        weight.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        return None
    return k.value, L.value, parent, is_leaf, desc, weight
