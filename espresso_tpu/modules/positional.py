"""Positional embeddings: sinusoidal (absolute) and relative (Transformer-XL).

Rebuilds fairseq/modules/sinusoidal_positional_embedding.py and the relative
positional embeddings used by the espresso speech transformer/conformer
(speech_transformer_encoder.py:121-158; espnet-style rel-pos in
fairseq/modules/espnet_multihead_attention.py).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def sinusoidal_positions(
    length: int, dim: int, offset: int = 0, dtype=jnp.float32
) -> jnp.ndarray:
    """[length, dim] sinusoidal table (fairseq convention: sin | cos halves)."""
    half = dim // 2
    emb_scale = math.log(10000.0) / (half - 1) if half > 1 else 1.0
    inv_freq = np.exp(np.arange(half, dtype=np.float64) * -emb_scale)
    pos = np.arange(offset, offset + length, dtype=np.float64)[:, None]
    args = pos * inv_freq[None, :]
    table = np.concatenate([np.sin(args), np.cos(args)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((length, 1))], axis=1)
    return jnp.asarray(table, dtype=dtype)


def relative_sinusoidal_positions(
    length: int, dim: int, dtype=jnp.float32
) -> jnp.ndarray:
    """[2*length-1, dim] table for relative offsets length-1 .. -(length-1)
    (espnet RelPositionalEncoding layout and frequencies:
    freq_k = 10000^(-2k/dim), fairseq/modules/espnet_positional_embedding.py)."""
    half = dim // 2
    emb_scale = math.log(10000.0) / half if half > 0 else 1.0
    inv_freq = np.exp(np.arange(half, dtype=np.float64) * -emb_scale)
    pos = np.arange(length - 1, -length, -1, dtype=np.float64)[:, None]
    args = pos * inv_freq[None, :]
    table = np.zeros((2 * length - 1, dim))
    table[:, 0::2] = np.sin(args)
    table[:, 1::2] = np.cos(args)
    return jnp.asarray(table, dtype=dtype)


def rotary_inv_freq(head_dim: int, base: float = 10000.0) -> np.ndarray:
    """Per-pair inverse frequencies for rotary embeddings
    (fairseq/modules/rotary_positional_embedding.py conventions)."""
    half = head_dim // 2
    return (1.0 / (base ** (np.arange(0, half, dtype=np.float64) / half))).astype(
        np.float32
    )


def apply_rotary(
    x: jnp.ndarray,  # [B, L, H, Dh]
    positions: jnp.ndarray,  # [L] absolute positions (may be traced)
    inv_freq: np.ndarray,  # [Dh//2] from rotary_inv_freq
) -> jnp.ndarray:
    """Rotate query/key head vectors by their absolute position (GPT-NeoX
    rotate-half layout, matching fairseq's rotary attention: split the head
    dim in two halves and apply the 2D rotation pairwise across halves).
    Attention scores then depend only on relative offsets."""
    ang = positions.astype(jnp.float32)[:, None] * jnp.asarray(inv_freq)[None, :]
    sin = jnp.sin(ang)[None, :, None, :].astype(x.dtype)
    cos = jnp.cos(ang)[None, :, None, :].astype(x.dtype)
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


def apply_rotary_single_step(
    x: jnp.ndarray,  # [B, 1, H, Dh] one query/key step per row
    positions: jnp.ndarray,  # [B] per-row absolute positions
    inv_freq: np.ndarray,
) -> jnp.ndarray:
    """Rotate one decode step per row by that row's own position (uneven
    beam advancement); same rotate-half convention as :func:`apply_rotary`."""
    ang = positions.astype(jnp.float32)[:, None] * jnp.asarray(inv_freq)[None, :]
    sin = jnp.sin(ang)[:, None, None, :].astype(x.dtype)
    cos = jnp.cos(ang)[:, None, None, :].astype(x.dtype)
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


class RelativePositionalEmbedding(nn.Module):
    """Learned or sinusoidal relative position table for self-attention.

    max_size bounds the relative offset range; offsets are clipped
    (reference speech_transformer_encoder.py learned rel-pos options).
    """

    embed_dim: int
    max_size: int
    learned: bool = False

    @nn.compact
    def __call__(self, length: int) -> jnp.ndarray:
        span = 2 * self.max_size - 1
        if self.learned:
            table = self.param(
                "table",
                nn.initializers.normal(self.embed_dim ** -0.5),
                (span, self.embed_dim),
            )
        else:
            table = relative_sinusoidal_positions(self.max_size, self.embed_dim)
        # slice the central [2*length-1] window (clip long sequences)
        L = min(length, self.max_size)
        center = self.max_size - 1
        return table[center - (L - 1) : center + L]
