"""SpecAugment on device — batched, jittable, with adaptive multiplicities.

Rebuild of the reference's two SpecAugment implementations:
  * fairseq/data/audio/feature_transforms/specaugment.py:13 (freq/time masks,
    time warp) — applied per-utterance in host dataloader workers.
  * espresso/data/feature_transforms/adaptive_specaugment.py:33-56 — adaptive
    number/width of time masks scaled by utterance length
    (``time_mask_pm``/``time_mask_ps``).

TPU-first change: instead of mutating features in host workers, the whole
augmentation is a pure jnp function over the padded batch [B, T, F] with a JAX
PRNG key, executed inside the jitted train step — zero host cost, fused by XLA
with the feature pipeline. Config strings are the reference's evaluatable-dict
format (``--specaugment-config``).
"""

from __future__ import annotations

import ast
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SpecAugmentConfig:
    freq_mask_width: int = 27  # F
    num_freq_masks: int = 2
    time_mask_width: int = 100  # T (max width, static cap)
    num_time_masks: int = 2  # static cap on count
    time_mask_p: float = 1.0  # p: max fraction of frames one mask may cover
    time_warp_w: int = 0  # W (0 = off)
    # adaptive (espresso): if set, #masks = floor(pm * len), width = ps * len
    time_mask_pm: Optional[float] = None
    time_mask_ps: Optional[float] = None
    max_time_masks: int = 20  # static bound for the adaptive count

    @classmethod
    def from_string(cls, config) -> "SpecAugmentConfig":
        d = ast.literal_eval(config) if isinstance(config, str) else dict(config)
        return cls(
            freq_mask_width=d.get("F", d.get("freq_mask_F", 27)),
            num_freq_masks=d.get("num_freq_masks", d.get("freq_mask_N", 2)),
            time_mask_width=d.get("T", d.get("time_mask_T", 100)),
            num_time_masks=d.get("num_time_masks", d.get("time_mask_N", 2)),
            time_mask_p=d.get("p", d.get("time_mask_p", 1.0)),
            time_warp_w=d.get("W", d.get("time_warp_W", 0)),
            time_mask_pm=d.get("time_mask_pm"),
            time_mask_ps=d.get("time_mask_ps"),
        )


def _interval_mask(length: int, starts: jnp.ndarray, widths: jnp.ndarray) -> jnp.ndarray:
    """OR of [start, start+width) intervals. starts/widths: [B, N] -> [B, length]."""
    pos = jnp.arange(length)[None, None, :]
    inside = (pos >= starts[..., None]) & (pos < (starts + widths)[..., None])
    return jnp.any(inside, axis=1)


def apply_specaugment(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    rng: jax.Array,
    cfg: SpecAugmentConfig,
    mask_value: float = 0.0,
) -> jnp.ndarray:
    """Apply SpecAugment to a padded batch. x: [B, T, F]; lengths: [B]."""
    B, T, F = x.shape
    k_f, k_t, k_w = jax.random.split(rng, 3)

    if cfg.time_warp_w > 0:
        x = _time_warp(x, lengths, k_w, cfg.time_warp_w)

    # -- frequency masks ----------------------------------------------------
    if cfg.num_freq_masks > 0 and cfg.freq_mask_width > 0:
        kf1, kf2 = jax.random.split(k_f)
        widths = jax.random.randint(
            kf1, (B, cfg.num_freq_masks), 0, cfg.freq_mask_width + 1
        )
        starts = jax.random.randint(kf2, (B, cfg.num_freq_masks), 0, max(F - 1, 1))
        widths = jnp.minimum(widths, F - starts)
        fmask = _interval_mask(F, starts, widths)  # [B, F]
        x = jnp.where(fmask[:, None, :], mask_value, x)

    # -- time masks ---------------------------------------------------------
    n_cap = (
        cfg.max_time_masks if cfg.time_mask_pm is not None else cfg.num_time_masks
    )
    if n_cap > 0:
        kt1, kt2, kt3 = jax.random.split(k_t, 3)
        lens_f = lengths.astype(jnp.float32)
        if cfg.time_mask_pm is not None:
            num_masks = jnp.floor(cfg.time_mask_pm * lens_f).astype(jnp.int32)
            num_masks = jnp.clip(num_masks, 0, n_cap)
            max_width = jnp.maximum(
                (cfg.time_mask_ps * lens_f).astype(jnp.int32), 1
            )
        else:
            num_masks = jnp.full((B,), cfg.num_time_masks, dtype=jnp.int32)
            max_width = jnp.full((B,), cfg.time_mask_width, dtype=jnp.int32)
        # cap each mask to p * length (reference specaugment.py semantics)
        max_width = jnp.minimum(
            max_width, jnp.maximum((cfg.time_mask_p * lens_f).astype(jnp.int32), 1)
        )
        u = jax.random.uniform(kt1, (B, n_cap))
        widths = (u * (max_width[:, None] + 1)).astype(jnp.int32)
        starts_u = jax.random.uniform(kt2, (B, n_cap))
        room = jnp.maximum(lengths[:, None] - widths, 0)
        starts = (starts_u * (room + 1)).astype(jnp.int32)
        active = jnp.arange(n_cap)[None, :] < num_masks[:, None]
        widths = jnp.where(active, widths, 0)
        tmask = _interval_mask(T, starts, widths)  # [B, T]
        x = jnp.where(tmask[:, :, None], mask_value, x)
    return x


def _time_warp(
    x: jnp.ndarray, lengths: jnp.ndarray, rng: jax.Array, W: int
) -> jnp.ndarray:
    """Piecewise-linear time warp (reference specaug_interpolate.py:63-105).

    A random anchor w0 in [W, len-W) moves to w0+w with w in [-W, W]; frames
    are linearly re-sampled on each side. Batched as one gather per batch.
    """
    B, T, F = x.shape
    k1, k2 = jax.random.split(rng)
    lens = lengths.astype(jnp.int32)
    ok = lens > 2 * W + 1
    hi = jnp.maximum(lens - W, W + 1)
    w0 = W + (
        jax.random.uniform(k1, (B,)) * (hi - W).astype(jnp.float32)
    ).astype(jnp.int32)
    w = jax.random.randint(k2, (B,), -W, W + 1)
    new_anchor = jnp.clip(w0 + w, 1, jnp.maximum(lens - 1, 1))

    t = jnp.arange(T)[None, :].astype(jnp.float32)  # output positions
    anchor = new_anchor[:, None].astype(jnp.float32)
    w0f = w0[:, None].astype(jnp.float32)
    lenf = lens[:, None].astype(jnp.float32)
    # left segment [0, anchor) maps from [0, w0); right from [w0, len)
    src = jnp.where(
        t < anchor,
        t * w0f / jnp.maximum(anchor, 1.0),
        w0f
        + (t - anchor)
        * (lenf - w0f)
        / jnp.maximum(lenf - anchor, 1.0),
    )
    src = jnp.clip(src, 0.0, lenf - 1.0)
    lo = jnp.floor(src).astype(jnp.int32)
    hi_idx = jnp.minimum(lo + 1, T - 1)
    frac = (src - lo.astype(jnp.float32))[..., None]
    gathered = (
        jnp.take_along_axis(x, lo[..., None].repeat(F, -1), axis=1) * (1 - frac)
        + jnp.take_along_axis(x, hi_idx[..., None].repeat(F, -1), axis=1) * frac
    )
    valid = (t < lenf)[..., None]
    out = jnp.where(valid, gathered, x)
    return jnp.where(ok[:, None, None], out, x)
