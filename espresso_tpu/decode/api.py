"""Incremental-decoder adapters: one step API over heterogeneous models.

The reference reorders nested incremental_state dicts by beam backpointers
(sequence_generator.py:357-374, masked_copy_cached_state speech_lstm.py:1001).
Here every model's decode state is an explicit pytree and reorder is one
``jnp.take`` per leaf — adapters declare which axis is the batch(+beam) axis
for each state layout.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from espresso_tpu.models.base import EncoderOut
from espresso_tpu.models.lstm_lm import LSTMLanguageModel
from espresso_tpu.models.speech_lstm import SpeechLSTMModel
from espresso_tpu.models.speech_transformer import SpeechTransformerModel


def repeat_encoder_out(enc: EncoderOut, beam: int) -> EncoderOut:
    """Replicate encoder rows beam times: [B, ...] -> [B*K, ...] with rows
    grouped per utterance (reference reorder_encoder_out :297-299)."""
    rep = lambda x: jnp.repeat(x, beam, axis=0)
    return EncoderOut(
        encoder_out=rep(enc.encoder_out),
        encoder_padding_mask=rep(enc.encoder_padding_mask),
        src_lengths=rep(enc.src_lengths),
    )


class LSTMDecoderAdapter:
    """speech_lstm decoder carry: (h [L,BK,H], c [L,BK,H], feed [BK,C],
    prev [BK])."""

    def __init__(self, model: SpeechLSTMModel):
        self.model = model

    def init_state(self, variables, enc, batch_k: int, max_len: int):
        return self.model.apply(variables, batch_k, method="init_decoder_carry")

    def step(self, variables, tokens, state, enc, step_idx):
        logits, state, attn = self.model.apply(
            variables, tokens, state, enc, method="decode_step"
        )
        return logits, state, attn

    def reorder(self, state, idx):
        h, c, feed, prev = state
        return (
            jnp.take(h, idx, axis=1),
            jnp.take(c, idx, axis=1),
            jnp.take(feed, idx, axis=0),
            jnp.take(prev, idx, axis=0),
        )


class TransformerDecoderAdapter:
    """Per-layer cache {self: {k,v [BK,S,H,Dh]}, cross: {k_static,v_static}}."""

    def __init__(self, model: SpeechTransformerModel):
        self.model = model

    def init_state(self, variables, enc, batch_k: int, max_len: int):
        return self.model.apply(variables, enc, max_len, method="init_cache")

    def step(self, variables, tokens, state, enc, step_idx):
        logits, state, attn = self.model.apply(
            variables, tokens, step_idx, state, enc, method="decode_step"
        )
        return logits, state, attn

    def reorder(self, state, idx):
        return jax.tree_util.tree_map(lambda x: jnp.take(x, idx, axis=0), state)


class LMAdapter:
    """LSTM LM for shallow fusion: same carry layout as the speech decoder."""

    def __init__(self, model: LSTMLanguageModel, subtract_pad: bool = False):
        self.model = model

    def init_state(self, variables, enc, batch_k: int, max_len: int):
        return self.model.apply(variables, batch_k, method="init_carry")

    def step(self, variables, tokens, state, enc=None, step_idx=None):
        logits, state = self.model.apply(
            variables, tokens, state, method="decode_step"
        )
        return logits, state, None

    def reorder(self, state, idx):
        h, c, feed, prev = state
        return (
            jnp.take(h, idx, axis=1),
            jnp.take(c, idx, axis=1),
            jnp.take(feed, idx, axis=0),
            jnp.take(prev, idx, axis=0),
        )


class TransformerLMAdapter:
    """Transformer LM for shallow fusion: carry = (per-layer k/v caches
    [BK, S, H, Dh], per-row position indices [BK]) — per-row positions let
    transducer AES beams advance the LM unevenly."""

    def __init__(self, model):
        self.model = model

    def init_state(self, variables, enc, batch_k: int, max_len: int):
        return self.model.apply(
            variables, batch_k, max_len, method="init_carry"
        )

    def step(self, variables, tokens, state, enc=None, step_idx=None):
        logits, state = self.model.apply(
            variables, tokens, state, method="decode_step"
        )
        return logits, state, None

    def reorder(self, state, idx):
        caches, pos = state
        return (
            jax.tree_util.tree_map(lambda x: jnp.take(x, idx, axis=0), caches),
            jnp.take(pos, idx, axis=0),
        )


def shard_for_decode(mesh, variables, batch):
    """Serving-style data-parallel decode: place params replicated and the
    batch sharded over the mesh's 'data' axis; the decoders' jitted search
    functions then partition across chips via GSPMD (no code changes in the
    decoders — the reference's --num-shards/--shard-id host sharding,
    speech_recognize.py:178-192, becomes one sharding annotation)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    variables = jax.device_put(variables, rep)
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim >= 1:
            spec = P("data", *([None] * (v.ndim - 1)))
            out[k] = jax.device_put(jnp.asarray(v), NamedSharding(mesh, spec))
        else:
            out[k] = v
    return variables, out


def make_adapter(model):
    from espresso_tpu.models.transformer_lm import TransformerLanguageModel

    if isinstance(model, SpeechTransformerModel):
        return TransformerDecoderAdapter(model)
    if isinstance(model, SpeechLSTMModel):
        return LSTMDecoderAdapter(model)
    if isinstance(model, LSTMLanguageModel):
        return LMAdapter(model)
    if isinstance(model, TransformerLanguageModel):
        return TransformerLMAdapter(model)
    if all(hasattr(model, m) for m in ("init_state", "step", "reorder")):
        return model  # object already implements the adapter protocol
    raise TypeError(f"no incremental adapter for {type(model).__name__}")
