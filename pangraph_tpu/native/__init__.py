"""Native host runtime: C++ kernels compiled at first use, bound via ctypes.

Holds the host-side hot loops that don't belong on the TPU: anchor chaining
DP (sequential scan; replaces the reference's lchain.c) and the banded
traceback fallback. Build: g++ -O3 -shared; cached in this directory keyed by
a source hash. All callers fall back to numpy implementations when the
toolchain is unavailable.
"""
from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger(__name__)

_HERE = os.path.dirname(__file__)
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_and_load():
    src = os.path.join(_HERE, "chain.cpp")
    with open(src, "rb") as f:
        tag = hashlib.blake2b(f.read(), digest_size=8).hexdigest()
    so = os.path.join(_HERE, f"_native_{tag}.so")
    if not os.path.exists(so):
        tmp = so + f".tmp{os.getpid()}"
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", tmp, src]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, so)
    return ctypes.CDLL(so)


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is None and not _TRIED:
            try:
                lib = _build_and_load()
                lib.chain_dp.restype = None
                lib.backtrace_band.restype = ctypes.c_int
                _LIB = lib
            except Exception as e:  # pragma: no cover
                log.warning("native library unavailable, using numpy fallbacks: %s", e)
            _TRIED = True
    return _LIB


def chain_dp_native(rpos: np.ndarray, qpos: np.ndarray, k: int, max_gap: int, bw: int, window: int):
    """f/parent arrays via the C++ chaining DP; None if native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(rpos)
    rpos = np.ascontiguousarray(rpos, dtype=np.int64)
    qpos = np.ascontiguousarray(qpos, dtype=np.int64)
    f = np.zeros(n, dtype=np.int64)
    parent = np.zeros(n, dtype=np.int64)
    lib.chain_dp(
        ctypes.c_int64(n),
        rpos.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        qpos.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int32(k),
        ctypes.c_int64(max_gap),
        ctypes.c_int64(bw),
        ctypes.c_int32(window),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        parent.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return f, parent


def backtrace_band_native(paths: np.ndarray, ref: np.ndarray, qry: np.ndarray, ms: int, W: int, B: int, clamped: bool):
    """C++ banded traceback. Returns (ops, n_ops, subs, n_subs, lead_ins,
    hit_boundary) or None (native unavailable / boundary / overflow -> None
    with flag)."""
    lib = get_lib()
    if lib is None:
        return None
    max_ops = 65536
    max_subs = 262144
    ops = np.zeros(max_ops * 2, dtype=np.int32)
    subs = np.zeros(max_subs * 2, dtype=np.int64)
    n_ops = ctypes.c_int64(0)
    n_subs = ctypes.c_int64(0)
    lead = ctypes.c_int64(0)
    hb = ctypes.c_int(0)
    paths = np.ascontiguousarray(paths, dtype=np.int8)
    ref = np.ascontiguousarray(ref, dtype=np.uint8)
    qry = np.ascontiguousarray(qry, dtype=np.uint8)
    rc = lib.backtrace_band(
        paths.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        ctypes.c_int64(B),
        ref.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(len(ref)),
        qry.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(len(qry)),
        ctypes.c_int64(ms),
        ctypes.c_int64(W),
        ctypes.c_int(1 if clamped else 0),
        ops.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(max_ops),
        ctypes.byref(n_ops),
        subs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(max_subs),
        ctypes.byref(n_subs),
        ctypes.byref(lead),
        ctypes.byref(hb),
    )
    return rc, ops, int(n_ops.value), subs, int(n_subs.value), int(lead.value), bool(hb.value)
