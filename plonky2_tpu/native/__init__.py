"""Native host runtime: ctypes bindings over host_hash.c (Keccak-f[1600]
+ the width-12 Goldilocks Poseidon permutation).

Compiled on demand with the system C compiler into the package directory
and loaded via ctypes (no pybind11 in this image). Callers use
``available()`` and fall back to the pure-Python paths when the compiler
or the .so is missing — the native layer is an accelerator, never a
requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "host_hash.c")
_SO = os.path.join(_HERE, "host_hash.so")

_lib = None
_lock = threading.Lock()
_failed = False


def _build() -> bool:
    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O3", "-shared", "-fPIC", "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _failed = True
            return None
        lib.poseidon_init.argtypes = [ctypes.c_void_p] * 3
        lib.poseidon_permute.argtypes = [ctypes.c_void_p]
        lib.poseidon_permute_batch.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.keccak256.argtypes = [
            ctypes.c_char_p,
            ctypes.c_uint64,
            ctypes.c_void_p,
        ]
        from ..hash.poseidon_constants import (
            ALL_ROUND_CONSTANTS,
            MDS_MATRIX_CIRC,
            MDS_MATRIX_DIAG,
        )

        rc = np.array(ALL_ROUND_CONSTANTS, dtype=np.uint64)
        circ = np.array(MDS_MATRIX_CIRC, dtype=np.uint64)
        diag = np.array(MDS_MATRIX_DIAG, dtype=np.uint64)
        lib.poseidon_init(
            rc.ctypes.data, circ.ctypes.data, diag.ctypes.data
        )
        # keep the arrays alive for the init copy duration only (memcpy'd)
        _lib = lib
        return _lib


def available() -> bool:
    if os.environ.get("PLONKY2_TPU_NATIVE", "") == "0":
        return False
    return _load() is not None


def poseidon_permute(state: Sequence[int]) -> List[int]:
    lib = _load()
    arr = np.array([int(x) for x in state], dtype=np.uint64)
    lib.poseidon_permute(arr.ctypes.data)
    return [int(x) for x in arr]


def poseidon_permute_batch(states: np.ndarray) -> np.ndarray:
    """[n, 12] u64 in, permuted out."""
    lib = _load()
    arr = np.ascontiguousarray(states, dtype=np.uint64)
    lib.poseidon_permute_batch(arr.ctypes.data, arr.shape[0])
    return arr


def keccak256(data: bytes) -> bytes:
    lib = _load()
    out = np.zeros(32, dtype=np.uint8)
    lib.keccak256(data, len(data), out.ctypes.data)
    return bytes(out)
