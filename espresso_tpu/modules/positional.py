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
