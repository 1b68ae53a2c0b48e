"""ctypes bridge to the native host runtime (native/libaqp_native.so).

Host-side generation for very large relations (the device generators in
generator.py jit everything on-device; for >HBM staging or multi-host
feeding, generating on the host in C++ and `device_put`-ing shards is the
fast path — the analog of the reference's C++ generator + preload ECALL,
secure_joins.cpp:34-49).

Falls back to numpy implementations when the shared library isn't built
(`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = Path(__file__).resolve().parents[2] / "native" / "libaqp_native.so"
    if so.exists():
        lib = ctypes.CDLL(str(so))
        lib.aqp_gen_pk.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_uint64]
        lib.aqp_gen_fk.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_uint64]
        lib.aqp_gen_zipf.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double, ctypes.c_uint64]
        _LIB = lib
    return _LIB


def _buf(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def gen_pk_host(n: int, seed: int = 11111) -> np.ndarray:
    lib = _load()
    out = np.empty(n, np.int32)
    if lib is not None:
        lib.aqp_gen_pk(_buf(out), n, seed)
        return out
    rng = np.random.default_rng(seed)
    out[:] = rng.permutation(n) + 1
    return out


def gen_fk_host(n: int, maxid: int, seed: int = 22222) -> np.ndarray:
    lib = _load()
    out = np.empty(n, np.int32)
    if lib is not None:
        lib.aqp_gen_fk(_buf(out), n, maxid, seed)
        return out
    rng = np.random.default_rng(seed)
    full = n // maxid
    parts = [rng.permutation(maxid) + 1 for _ in range(full)]
    rem = n - full * maxid
    if rem:
        parts.append((rng.permutation(maxid) + 1)[:rem])
    out[:] = np.concatenate(parts) if parts else np.empty(0, np.int32)
    return out


def gen_zipf_host(n: int, alphabet: int, z: float, seed: int = 22222) -> np.ndarray:
    lib = _load()
    out = np.empty(n, np.int32)
    if lib is not None:
        lib.aqp_gen_zipf(_buf(out), n, alphabet, z, seed)
        return out
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, alphabet + 1, dtype=np.float64)
    cdf = np.cumsum(ranks ** (-z))
    cdf /= cdf[-1]
    u = rng.random(n)
    idx = np.searchsorted(cdf, u)
    alpha = rng.permutation(alphabet) + 1
    out[:] = alpha[np.clip(idx, 0, alphabet - 1)]
    return out
