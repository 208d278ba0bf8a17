"""Lightweight and dynamic convolutions ("Pay Less Attention with
Lightweight and Dynamic Convolutions", Wu et al. 2019).

Rebuild of fairseq/modules/lightweight_convolution.py +
dynamic_convolution.py and their CUDA kernels
(fairseq/modules/{lightconv,dynamicconv}_layer/*.cu, SURVEY.md §2.3): both
are banded depthwise convolutions with weights shared across channel groups
(heads) — lightweight uses a learned [H, K] kernel, dynamic predicts a
per-position kernel from the token itself. On TPU the unfold-then-einsum
formulation lowers to one MXU matmul per head group, so no custom kernel is
needed; XLA fuses the softmax normalization and the shift-gather.

Layout is [B, T, C] (batch-major; the reference's TBC layout is a
CUDA-kernel artifact)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _unfold(x: jnp.ndarray, kernel_size: int, padding_l: int) -> jnp.ndarray:
    """x: [B, T, C] -> [B, T, K, C] where out[:, t, k] = x[:, t - padding_l + k]
    (zeros outside), matching fairseq unfold1d semantics."""
    B, T, C = x.shape
    K = kernel_size
    pad_r = K - 1 - padding_l
    xp = jnp.pad(x, ((0, 0), (padding_l, max(pad_r, 0)), (0, 0)))
    if pad_r < 0:
        xp = xp[:, : pad_r or None]
    idx = jnp.arange(T)[:, None] + jnp.arange(K)[None, :]  # [T, K]
    return xp[:, idx]  # [B, T, K, C]


class LightweightConv1d(nn.Module):
    """Depthwise conv with a shared [num_heads, K] kernel
    (LightweightConv1dTBC semantics; weight_softmax normalizes the kernel
    over the K taps). padding_l = K-1 gives a causal (decoder) convolution."""

    input_size: int
    kernel_size: int = 1
    padding_l: Optional[int] = None
    num_heads: int = 1
    weight_softmax: bool = False
    weight_dropout: float = 0.0
    bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, T, C = x.shape
        H, K = self.num_heads, self.kernel_size
        assert C == self.input_size and C % H == 0
        pad_l = self.padding_l if self.padding_l is not None else (
            K // 2 if K % 2 == 1 else K // 2 - 1
        )
        w = self.param(
            "weight", nn.initializers.xavier_uniform(), (H, K)
        ).astype(jnp.float32)
        if self.weight_softmax:
            w = jax.nn.softmax(w, axis=-1)
        if self.weight_dropout > 0.0 and train:
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - self.weight_dropout, w.shape
            )
            w = jnp.where(keep, w / (1.0 - self.weight_dropout), 0.0)
        unf = _unfold(x, K, pad_l).reshape(B, T, K, H, C // H)
        out = jnp.einsum("btkhr,hk->bthr", unf, w.astype(x.dtype))
        out = out.reshape(B, T, C)
        if self.bias:
            out = out + self.param("bias", nn.initializers.zeros, (C,)).astype(
                x.dtype
            )
        return out


class DynamicConv1d(nn.Module):
    """Per-position kernels predicted from the token (DynamicConv1dTBC):
    weight_linear: [B, T, Q] -> [B, T, H*K], softmax over K, then the same
    banded depthwise convolution as LightweightConv1d."""

    input_size: int
    kernel_size: int = 1
    padding_l: Optional[int] = None
    num_heads: int = 1
    weight_softmax: bool = False
    weight_dropout: float = 0.0
    query_size: Optional[int] = None
    conv_bias: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        query: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        B, T, C = x.shape
        H, K = self.num_heads, self.kernel_size
        assert C == self.input_size and C % H == 0
        pad_l = self.padding_l if self.padding_l is not None else (
            K // 2 if K % 2 == 1 else K // 2 - 1
        )
        q = x if query is None else query
        w = nn.Dense(H * K, name="weight_linear")(q)  # [B, T, H*K]
        w = w.reshape(B, T, H, K).astype(jnp.float32)
        if self.weight_softmax:
            w = jax.nn.softmax(w, axis=-1)
        if self.weight_dropout > 0.0 and train:
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - self.weight_dropout, w.shape
            )
            w = jnp.where(keep, w / (1.0 - self.weight_dropout), 0.0)
        unf = _unfold(x, K, pad_l).reshape(B, T, K, H, C // H)
        out = jnp.einsum("btkhr,bthk->bthr", unf, w.astype(x.dtype))
        out = out.reshape(B, T, C)
        if self.conv_bias:
            out = out + self.param(
                "conv_bias", nn.initializers.zeros, (C,)
            ).astype(x.dtype)
        return out
