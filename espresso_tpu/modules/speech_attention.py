"""Bahdanau / Luong attention for LSTM decoders.

Rebuild of espresso/modules/speech_attention.py (BahdanauAttention :38,
LuongAttention :90): single-query attention over encoder frames, returning
(context, normalized scores). Batched over B; used once per decoder step
inside a ``lax.scan``/``while_loop``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espresso_tpu.ops.masking import NEG_INF


class BahdanauAttention(nn.Module):
    """score = v^T tanh(W_q q + W_k k) (optionally weight-normalized v)."""

    embed_dim: int  # attention dim
    normalize: bool = True

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [B, Dq]
        keys: jnp.ndarray,  # [B, T, Dk] (encoder outputs)
        key_padding_mask: Optional[jnp.ndarray] = None,  # [B, T] True = valid
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        q = nn.Dense(self.embed_dim, use_bias=False, name="query_proj")(query)
        k = nn.Dense(self.embed_dim, use_bias=False, name="key_proj")(keys)
        v = self.param("v", nn.initializers.normal(0.1), (self.embed_dim,))
        if self.normalize:
            g = self.param("g", nn.initializers.constant(1.0), ())
            b = self.param("b", nn.initializers.zeros, (self.embed_dim,))
            vn = g * v / jnp.maximum(jnp.linalg.norm(v), 1e-8)
            scores = jnp.einsum(
                "btd,d->bt", jnp.tanh(q[:, None, :] + k + b), vn
            )
        else:
            scores = jnp.einsum("btd,d->bt", jnp.tanh(q[:, None, :] + k), v)
        if key_padding_mask is not None:
            scores = jnp.where(key_padding_mask, scores, NEG_INF)
        weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
            keys.dtype
        )
        context = jnp.einsum("bt,btd->bd", weights, keys)
        return context, weights


class LuongAttention(nn.Module):
    """score = q^T (W k), optionally scaled (reference :90)."""

    scale: bool = True

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [B, Dq]
        keys: jnp.ndarray,  # [B, T, Dk]
        key_padding_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        Dq = query.shape[-1]
        k = nn.Dense(Dq, use_bias=False, name="key_proj")(keys)
        scores = jnp.einsum("bd,btd->bt", query, k)
        if self.scale:
            g = self.param("g", nn.initializers.constant(1.0), ())
            scores = g * scores
        if key_padding_mask is not None:
            scores = jnp.where(key_padding_mask, scores, NEG_INF)
        weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
            keys.dtype
        )
        context = jnp.einsum("bt,btd->bd", weights, keys)
        return context, weights
