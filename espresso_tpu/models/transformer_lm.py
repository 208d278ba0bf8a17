"""Decoder-only transformer language model (``transformer_lm``).

Rebuild of fairseq/models/transformer_lm.py: causal self-attention stack with
optional adaptive input embeddings and adaptive softmax output
(Baevski & Auli 2019), shared input/output embeddings, learned or sinusoidal
positions. Usable as the LM task's model and for shallow fusion in beam
search (the incremental carry is an explicit (cache, index) pytree —
decode/api.TransformerLMAdapter).

TPU design: training forward is one causal pass (full [B, U, V] logits only
materialize when the criterion asks; the ``adaptive_loss`` path scores
targets through AdaptiveSoftmax.target_lprobs without building [.., V]).
Incremental decode uses the same functional k/v cache as the speech
transformer decoder (dynamic_update_slice at ``index``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espresso_tpu.modules.adaptive_softmax import AdaptiveInput, AdaptiveSoftmax
from espresso_tpu.modules.attention import MultiheadAttention
from espresso_tpu.modules.positional import sinusoidal_positions
from espresso_tpu.ops.masking import NEG_INF
from espresso_tpu.registry import MODELS, register_architecture


@dataclass
class TransformerLMConfig:
    name: str = "transformer_lm"
    vocab_size: int = 0
    embed_dim: int = 512
    ffn_dim: int = 2048
    layers: int = 6
    heads: int = 8
    dropout: float = 0.1
    pos: str = "sinusoidal"  # sinusoidal | learned | none
    max_target_positions: int = 2048
    share_embed: bool = True
    adaptive_input: bool = False
    adaptive_softmax_cutoff: Optional[Tuple[int, ...]] = None
    adaptive_factor: float = 4.0
    pad_index: int = 1
    is_wordlm: bool = False


class _LMLayer(nn.Module):
    """Pre-norm causal self-attention block with functional decode cache."""

    embed_dim: int
    ffn_dim: int
    num_heads: int
    dropout: float = 0.0

    def setup(self):
        self.self_attn = MultiheadAttention(
            self.embed_dim, self.num_heads, dropout=self.dropout
        )
        self.self_attn_layer_norm = nn.LayerNorm()
        self.final_layer_norm = nn.LayerNorm()
        self.fc1 = nn.Dense(self.ffn_dim)
        self.fc2 = nn.Dense(self.embed_dim)
        self.drop = nn.Dropout(rate=self.dropout)

    def __call__(
        self,
        x: jnp.ndarray,
        self_attn_mask: Optional[jnp.ndarray] = None,
        cache: Optional[Dict[str, Any]] = None,
        cache_index: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
        deterministic = not train
        h = self.self_attn_layer_norm(x)
        h, _, new_cache = self.self_attn(
            h,
            h,
            h,
            attn_mask=self_attn_mask,
            cache=cache,
            cache_index=cache_index,
            deterministic=deterministic,
        )
        if self.dropout > 0.0 and train:
            h = self.drop(h, deterministic=False)
        x = x + h
        h = self.final_layer_norm(x)
        h = self.fc2(nn.relu(self.fc1(h)))
        if self.dropout > 0.0 and train:
            h = self.drop(h, deterministic=False)
        return x + h, new_cache

    def make_cache(self, B: int, max_len: int, dtype=jnp.float32):
        Dh = self.embed_dim // self.num_heads
        return {
            "k": jnp.zeros((B, max_len, self.num_heads, Dh), dtype),
            "v": jnp.zeros((B, max_len, self.num_heads, Dh), dtype),
        }


@MODELS.register("transformer_lm", config=TransformerLMConfig)
class TransformerLanguageModel(nn.Module):
    cfg: TransformerLMConfig

    def setup(self):
        cfg = self.cfg
        if cfg.adaptive_input:
            assert cfg.adaptive_softmax_cutoff, (
                "adaptive_input needs adaptive_softmax_cutoff for the bands"
            )
            self.embed = AdaptiveInput(
                cfg.vocab_size,
                cfg.embed_dim,
                tuple(cfg.adaptive_softmax_cutoff),
                factor=cfg.adaptive_factor,
                name="adaptive_embed",
            )
        else:
            self.embed = nn.Embed(cfg.vocab_size, cfg.embed_dim, name="embed_tokens")
        if cfg.pos == "learned":
            self.pos_table = self.param(
                "pos_table",
                nn.initializers.normal(cfg.embed_dim ** -0.5),
                (cfg.max_target_positions, cfg.embed_dim),
            )
        self.lm_layers = [
            _LMLayer(
                cfg.embed_dim,
                cfg.ffn_dim,
                cfg.heads,
                dropout=cfg.dropout,
                name=f"layer{i}",
            )
            for i in range(cfg.layers)
        ]
        self.final_norm = nn.LayerNorm(name="final_norm")
        self.drop = nn.Dropout(rate=cfg.dropout)
        if cfg.adaptive_softmax_cutoff:
            self.adaptive_softmax = AdaptiveSoftmax(
                cfg.vocab_size,
                cfg.embed_dim,
                tuple(cfg.adaptive_softmax_cutoff),
                factor=cfg.adaptive_factor,
                dropout=cfg.dropout,
                name="adaptive_softmax",
            )
        elif not cfg.share_embed:
            self.fc_out = nn.Dense(cfg.vocab_size, use_bias=False, name="fc_out")

    def _pos_table(self):
        """Full [max_target_positions, D] position table (one source of
        truth for training and incremental decode)."""
        cfg = self.cfg
        if cfg.pos == "learned":
            return self.pos_table
        if cfg.pos == "sinusoidal":
            return sinusoidal_positions(cfg.max_target_positions, cfg.embed_dim)
        return None

    def _positions(self, U: int, offset=0):
        cfg = self.cfg
        if cfg.pos == "learned":
            if isinstance(offset, int) and offset == 0:
                return self.pos_table[:U]
            return jax.lax.dynamic_slice(
                self.pos_table, (offset, 0), (U, cfg.embed_dim)
            )
        if cfg.pos == "sinusoidal":
            if isinstance(offset, int):
                return sinusoidal_positions(U, cfg.embed_dim, offset=offset)
            table = sinusoidal_positions(
                cfg.max_target_positions, cfg.embed_dim
            )
            return jax.lax.dynamic_slice(table, (offset, 0), (U, cfg.embed_dim))
        return jnp.zeros((U, cfg.embed_dim))

    def _features(self, prev_output_tokens, train):
        cfg = self.cfg
        B, U = prev_output_tokens.shape
        x = self.embed(prev_output_tokens) * (cfg.embed_dim ** 0.5)
        x = x + self._positions(U)[None].astype(x.dtype)
        if cfg.dropout > 0.0 and train:
            x = self.drop(x, deterministic=False)
        causal = jnp.where(
            jnp.tril(jnp.ones((U, U), bool)), 0.0, NEG_INF
        ).astype(jnp.float32)
        for layer in self.lm_layers:
            x, _ = layer(x, self_attn_mask=causal, train=train)
        return self.final_norm(x)

    def output_logits(self, x):
        cfg = self.cfg
        if cfg.adaptive_softmax_cutoff:
            # full table (log-probs are valid logits for downstream softmax)
            return self.adaptive_softmax.log_probs(x)
        if cfg.share_embed and not cfg.adaptive_input:
            return self.embed.attend(x)
        return self.fc_out(x)

    def __call__(self, prev_output_tokens: jnp.ndarray, train: bool = False):
        return self.output_logits(self._features(prev_output_tokens, train))

    def target_lprobs(
        self, prev_output_tokens: jnp.ndarray, targets: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        """Training-path target log-probs without materializing [B, U, V]
        (the adaptive_loss criterion's fast path)."""
        x = self._features(prev_output_tokens, train)
        if self.cfg.adaptive_softmax_cutoff:
            return self.adaptive_softmax.target_lprobs(x, targets, train=train)
        logits = self.output_logits(x)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.take_along_axis(lp, targets[..., None], axis=-1)[..., 0]

    # -- incremental decoding (fusion) ----------------------------------------
    def init_carry(self, batch_size: int, max_len: int, dtype=jnp.float32):
        # per-ROW position counter: beam searches that advance rows by
        # different numbers of steps (transducer AES fusion) stay correct;
        # lockstep decoders simply see a constant vector
        return (
            [
                layer.make_cache(batch_size, max_len, dtype)
                for layer in self.lm_layers
            ],
            jnp.zeros((batch_size,), jnp.int32),
        )

    def decode_step(self, tokens: jnp.ndarray, carry):
        """tokens: [B] -> (logits [B, V], carry)."""
        cfg = self.cfg
        caches, idx = carry
        x = self.embed(tokens)[:, None, :] * (cfg.embed_dim ** 0.5)
        table = self._pos_table()
        if table is not None:
            x = x + jnp.take(table, idx, axis=0, mode="clip")[:, None, :].astype(x.dtype)
        new_caches = []
        for layer, cache in zip(self.lm_layers, caches):
            x, new_cache = layer(x, cache=cache, cache_index=idx)
            new_caches.append(new_cache)
        x = self.final_norm(x)
        return self.output_logits(x)[:, 0], (new_caches, idx + 1)


@register_architecture("transformer_lm", "transformer_lm_big")
def _arch_tlm_big(cfg: TransformerLMConfig):
    cfg.embed_dim = 1024
    cfg.ffn_dim = 4096
    cfg.layers = 12
    cfg.heads = 16


@register_architecture("transformer_lm", "transformer_lm_wiki103")
def _arch_tlm_wiki103(cfg: TransformerLMConfig):
    # fairseq transformer_lm_wiki103: adaptive inputs + adaptive softmax
    cfg.embed_dim = 1024
    cfg.ffn_dim = 4096
    cfg.layers = 16
    cfg.heads = 8
    cfg.dropout = 0.3
    cfg.adaptive_input = True
    cfg.adaptive_softmax_cutoff = (20000, 60000)


@register_architecture("transformer_lm", "transformer_lm_gpt")
def _arch_tlm_gpt(cfg: TransformerLMConfig):
    cfg.embed_dim = 768
    cfg.ffn_dim = 3072
    cfg.layers = 12
    cfg.heads = 12
    cfg.dropout = 0.1
