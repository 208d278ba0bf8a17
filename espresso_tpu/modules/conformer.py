"""Conformer encoder layer (macaron FFN + rel-pos MHSA + depthwise conv).

Rebuild of espresso/modules/
conformer_with_relative_positional_embedding_encoder_layer.py:113-144 and the
fairseq pieces it reuses (fairseq/modules/conformer_layer.py:
ConvolutionModule, FeedForwardModule): FFN(×0.5) → MHSA(+rel-pos) →
ConvModule(pointwise→GLU→depthwise k=31→norm→swish→pointwise) → FFN(×0.5) →
final LayerNorm. Attention masks use a -1e8 fill (reference :104-111) so fully
masked rows never produce NaN.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from espresso_tpu.modules.attention import MultiheadAttention


class FeedForwardModule(nn.Module):
    embed_dim: int
    ffn_dim: int
    dropout: float = 0.0
    activation: str = "swish"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.ffn_dim)(h)
        h = nn.swish(h) if self.activation == "swish" else nn.relu(h)
        if self.dropout > 0.0 and not deterministic:
            h = nn.Dropout(rate=self.dropout)(h, deterministic=False)
        h = nn.Dense(self.embed_dim)(h)
        if self.dropout > 0.0 and not deterministic:
            h = nn.Dropout(rate=self.dropout)(h, deterministic=False)
        return h


class ConvolutionModule(nn.Module):
    embed_dim: int
    kernel_size: int = 31
    dropout: float = 0.0
    norm_type: str = "batch"  # batch | layer

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, T, D]
        padding_mask: Optional[jnp.ndarray] = None,  # [B, T] True = valid
        train: bool = False,
    ) -> jnp.ndarray:
        h = nn.LayerNorm()(x)
        h = nn.Dense(2 * self.embed_dim)(h)  # pointwise conv 1
        h = nn.glu(h, axis=-1)
        if padding_mask is not None:
            h = h * padding_mask[..., None].astype(h.dtype)
        # depthwise conv along time
        h = nn.Conv(
            self.embed_dim,
            kernel_size=(self.kernel_size,),
            feature_group_count=self.embed_dim,
            padding="SAME",
        )(h)
        if self.norm_type == "batch":
            # fp32 running stats would promote everything downstream under
            # bf16 mixed precision — re-anchor to the block's compute dtype
            h = nn.BatchNorm(use_running_average=not train)(h).astype(h.dtype)
        else:
            h = nn.LayerNorm()(h)
        h = nn.swish(h)
        h = nn.Dense(self.embed_dim)(h)  # pointwise conv 2
        if self.dropout > 0.0 and train:
            h = nn.Dropout(rate=self.dropout)(h, deterministic=False)
        return h


class ConformerEncoderLayer(nn.Module):
    embed_dim: int
    ffn_dim: int
    num_heads: int
    depthwise_kernel_size: int = 31
    dropout: float = 0.0
    use_relative_pos: bool = True
    use_rotary: bool = False
    conv_norm_type: str = "batch"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, T, D]
        padding_mask: Optional[jnp.ndarray] = None,  # [B, T] True = valid
        attn_mask: Optional[jnp.ndarray] = None,  # additive [T, T]
        rel_pos: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        deterministic = not train
        x = x + 0.5 * FeedForwardModule(
            self.embed_dim, self.ffn_dim, self.dropout, name="ffn1"
        )(x, deterministic)

        h = nn.LayerNorm(name="self_attn_layer_norm")(x)
        h, _, _ = MultiheadAttention(
            self.embed_dim,
            self.num_heads,
            dropout=self.dropout,
            use_relative_pos=self.use_relative_pos,
            use_rotary=self.use_rotary,
            name="self_attn",
        )(
            h,
            h,
            h,
            key_padding_mask=padding_mask,
            attn_mask=attn_mask,
            rel_pos=rel_pos,
            deterministic=deterministic,
        )
        if self.dropout > 0.0 and train:
            h = nn.Dropout(rate=self.dropout)(h, deterministic=False)
        x = x + h

        x = x + ConvolutionModule(
            self.embed_dim,
            self.depthwise_kernel_size,
            self.dropout,
            norm_type=self.conv_norm_type,
            name="conv_module",
        )(x, padding_mask, train)

        x = x + 0.5 * FeedForwardModule(
            self.embed_dim, self.ffn_dim, self.dropout, name="ffn2"
        )(x, deterministic)
        x = nn.LayerNorm(name="final_layer_norm")(x)
        if padding_mask is not None:
            x = x * padding_mask[..., None].astype(x.dtype)
        return x


class TransformerEncoderLayer(nn.Module):
    """Pre-norm transformer encoder layer (the reference's default layer type,
    speech_transformer_encoder.py:196-201 with layer_type='transformer')."""

    embed_dim: int
    ffn_dim: int
    num_heads: int
    dropout: float = 0.0
    use_relative_pos: bool = False
    use_rotary: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        padding_mask: Optional[jnp.ndarray] = None,
        attn_mask: Optional[jnp.ndarray] = None,
        rel_pos: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        deterministic = not train
        h = nn.LayerNorm(name="self_attn_layer_norm")(x)
        h, _, _ = MultiheadAttention(
            self.embed_dim,
            self.num_heads,
            dropout=self.dropout,
            use_relative_pos=self.use_relative_pos,
            use_rotary=self.use_rotary,
            name="self_attn",
        )(
            h,
            h,
            h,
            key_padding_mask=padding_mask,
            attn_mask=attn_mask,
            rel_pos=rel_pos,
            deterministic=deterministic,
        )
        if self.dropout > 0.0 and train:
            h = nn.Dropout(rate=self.dropout)(h, deterministic=False)
        x = x + h
        h = nn.LayerNorm(name="final_layer_norm")(x)
        h = nn.Dense(self.ffn_dim)(h)
        h = nn.relu(h)
        if self.dropout > 0.0 and train:
            h = nn.Dropout(rate=self.dropout)(h, deterministic=False)
        h = nn.Dense(self.embed_dim)(h)
        if self.dropout > 0.0 and train:
            h = nn.Dropout(rate=self.dropout)(h, deterministic=False)
        return x + h
