"""Cross-entropy losses with label smoothing (uniform / unigram / temporal).

Rebuild of espresso/criterions/label_smoothed_cross_entropy_v2.py semantics:
  * uniform — eps_i = eps/(V-1); loss = (1-eps-eps_i)*nll + eps_i*(-sum lp)
  * unigram — smoothing distribution proportional to token unigram counts with
    a pseudo-count (:82-121)
  * temporal — probability mass on target-sequence neighbors at distance
    ±1/±2 with a 5:2 ratio (:49-81, arXiv:1612.02695)

All functions are pure jnp over padded [B, U, V] log-probs with a [B, U]
validity mask, so they fuse into the jitted train step.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def log_softmax(logits: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=axis)


def cross_entropy_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Summed NLL over valid positions. Returns (loss_sum, nll_sum)."""
    lprobs = log_softmax(logits)
    nll = -jnp.take_along_axis(lprobs, target[..., None], axis=-1)[..., 0]
    nll = jnp.where(mask, nll, 0.0)
    total = nll.sum()
    return total, total


def temporal_smoothing_weights(
    target: jnp.ndarray, vocab_size: int, pad_index: int
) -> jnp.ndarray:
    """[B, U, V] neighbor smoothing distribution (reference :49-81)."""
    B, U = target.shape

    def shifted(offset: int) -> jnp.ndarray:
        if offset < 0:
            sl = jnp.concatenate(
                [jnp.full((B, -offset), pad_index, target.dtype), target[:, :offset]],
                axis=1,
            )
        else:
            sl = jnp.concatenate(
                [target[:, offset:], jnp.full((B, offset), pad_index, target.dtype)],
                axis=1,
            )
        return sl

    weights = jnp.zeros((B, U, vocab_size), dtype=jnp.float32)
    for offset, w in ((-2, 2.0), (-1, 5.0), (1, 5.0), (2, 2.0)):
        idx = shifted(offset)
        weights = weights + w * jax.nn.one_hot(idx, vocab_size, dtype=jnp.float32)
    weights = weights.at[:, :, pad_index].set(0.0)
    denom = weights.sum(-1, keepdims=True)
    return weights / jnp.maximum(denom, 1.0)


def label_smoothed_cross_entropy(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray,
    epsilon: float,
    smoothing_type: str = "uniform",
    pad_index: int = 0,
    unigram_probs: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Summed label-smoothed CE. Returns (loss_sum, nll_sum).

    logits: [B, U, V]; target: [B, U] int; mask: [B, U] bool/float.
    """
    lprobs = log_softmax(logits)
    V = lprobs.shape[-1]
    nll = -jnp.take_along_axis(lprobs, target[..., None], axis=-1)[..., 0]
    if smoothing_type == "uniform":
        smooth = -lprobs.sum(axis=-1)
        eps_i = epsilon / (V - 1)
        coeff_nll, coeff_smooth = 1.0 - epsilon - eps_i, eps_i
    elif smoothing_type == "unigram":
        assert unigram_probs is not None
        smooth = -(lprobs @ unigram_probs.astype(lprobs.dtype))
        coeff_nll, coeff_smooth = 1.0 - epsilon, epsilon
    elif smoothing_type == "temporal":
        probs = temporal_smoothing_weights(target, V, pad_index)
        smooth = -(lprobs * probs).sum(axis=-1)
        coeff_nll, coeff_smooth = 1.0 - epsilon, epsilon
    else:
        raise ValueError(f"unsupported smoothing type {smoothing_type!r}")
    m = mask.astype(lprobs.dtype)
    nll_sum = (nll * m).sum()
    smooth_sum = (smooth * m).sum()
    loss = coeff_nll * nll_sum + coeff_smooth * smooth_sum
    return loss, nll_sum


def unigram_probs_from_counts(
    counts: np.ndarray, pseudo_count: float, pad_index: int
) -> np.ndarray:
    """Unigram smoothing distribution from dictionary counts (reference :82+)."""
    c = np.asarray(counts, dtype=np.float64) + pseudo_count
    c[pad_index] = 0.0
    return (c / c.sum()).astype(np.float32)
