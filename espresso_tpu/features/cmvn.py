"""Cepstral mean/variance normalization.

Global CMVN (reference fairseq/data/audio/feature_transforms/global_cmvn.py:9,
stats produced by espresso/tools/compute_global_cmvn_stats.py as an .npz with
``mean``/``std``) and utterance-level CMVN
(feature_transforms/utterance_cmvn.py). Both are pure jnp ops applied on
device inside the jitted step (TPU-first: normalization rides the same fused
program as the model instead of running in host workers).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


class GlobalCMVN:
    def __init__(self, stats_npz_path: str):
        stats = np.load(stats_npz_path)
        self.mean = jnp.asarray(stats["mean"], dtype=jnp.float32)
        self.std = jnp.asarray(stats["std"], dtype=jnp.float32)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return (x - self.mean) / self.std


def compute_global_cmvn_stats(frames_iter) -> dict:
    """Accumulate mean/std over an iterator of [T, F] arrays
    (espresso/tools/compute_global_cmvn_stats.py semantics)."""
    count = 0
    total = None
    total_sq = None
    for mat in frames_iter:
        mat = np.asarray(mat, dtype=np.float64)
        if total is None:
            total = mat.sum(axis=0)
            total_sq = (mat ** 2).sum(axis=0)
        else:
            total += mat.sum(axis=0)
            total_sq += (mat ** 2).sum(axis=0)
        count += mat.shape[0]
    mean = total / count
    var = total_sq / count - mean ** 2
    return {
        "mean": mean.astype(np.float32),
        "std": np.sqrt(np.maximum(var, 1e-10)).astype(np.float32),
    }


def utterance_cmvn(
    x: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
    norm_means: bool = True,
    norm_vars: bool = False,
) -> jnp.ndarray:
    """Per-utterance CMVN over valid frames. x: [B, T, F] or [T, F]."""
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    B, T, F = x.shape
    if lengths is None:
        mask = jnp.ones((B, T, 1), dtype=x.dtype)
        denom = jnp.full((B, 1, 1), T, dtype=x.dtype)
    else:
        mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(x.dtype)[..., None]
        denom = jnp.maximum(lengths[:, None, None].astype(x.dtype), 1.0)
    mean = jnp.sum(x * mask, axis=1, keepdims=True) / denom
    if norm_means:
        out = (x - mean) * mask
    else:
        out = x
    if norm_vars:
        var = jnp.sum(((x - mean) * mask) ** 2, axis=1, keepdims=True) / denom
        out = out / jnp.sqrt(jnp.maximum(var, 1e-10))
        out = out * mask
    return out[0] if squeeze else out
