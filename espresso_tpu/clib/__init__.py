"""Native host-side kernels (C++ via ctypes).

The reference ships C++/CUDA/Cython extensions (SURVEY.md §2.3). The
TPU-native rebuild keeps native code for host-side hot paths; device compute
goes through XLA/Pallas. Libraries build lazily with g++ on first use and
fall back to pure-NumPy implementations when no toolchain is present.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_CLIB_DIR = os.path.dirname(os.path.abspath(__file__))
_cache: dict = {}


def _build_and_load(name: str) -> Optional[ctypes.CDLL]:
    if name in _cache:
        return _cache[name]
    src = os.path.join(_CLIB_DIR, f"{name}.cpp")
    so = os.path.join(_CLIB_DIR, f"lib{name}.so")
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(so)
    except (OSError, subprocess.CalledProcessError) as e:
        logger.warning("native %s unavailable (%s); using NumPy fallback", name, e)
        lib = None
    _cache[name] = lib
    return lib


def edit_distance_lib() -> Optional[ctypes.CDLL]:
    lib = _build_and_load("edit_distance")
    if lib is not None and not getattr(lib, "_configured", False):
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.batched_edit_counts.argtypes = [
            i32p,
            i32p,
            i32p,
            i32p,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            i32p,
        ]
        lib.batched_edit_counts.restype = None
        lib._configured = True
    return lib


def batched_edit_counts(
    refs: list, hyps: list
) -> Optional[np.ndarray]:
    """Batched (corr, sub, ins, del) counts over int-token sequences.
    Returns [B, 4] or None when the native lib is unavailable."""
    lib = edit_distance_lib()
    if lib is None:
        return None
    B = len(refs)
    max_ref = max((len(r) for r in refs), default=1) or 1
    max_hyp = max((len(h) for h in hyps), default=1) or 1
    ref_arr = np.full((B, max_ref), -1, np.int32)
    hyp_arr = np.full((B, max_hyp), -1, np.int32)
    ref_lens = np.zeros(B, np.int32)
    hyp_lens = np.zeros(B, np.int32)
    for b, (r, h) in enumerate(zip(refs, hyps)):
        ref_arr[b, : len(r)] = r
        hyp_arr[b, : len(h)] = h
        ref_lens[b] = len(r)
        hyp_lens[b] = len(h)
    out = np.zeros((B, 4), np.int32)
    lib.batched_edit_counts(
        np.ascontiguousarray(ref_arr),
        ref_lens,
        np.ascontiguousarray(hyp_arr),
        hyp_lens,
        B,
        max_ref,
        max_hyp,
        out,
    )
    return out


def batching_lib() -> Optional[ctypes.CDLL]:
    lib = _build_and_load("batching")
    if lib is not None and not getattr(lib, "_configured", False):
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.batch_by_size_fast.argtypes = [
            i64p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            i64p,
        ]
        lib.batch_by_size_fast.restype = ctypes.c_int64
        lib._configured = True
    return lib
