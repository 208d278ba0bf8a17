"""LSTM language model (``lstm_lm_espresso``).

Rebuild of espresso/models/lstm_lm.py:88: the speech LSTM decoder in LM mode
(no attention, encoder_output_units=0), with the named architectures
lstm_lm_{wsj,librispeech,swbd} and lstm_wordlm_wsj (:216-249). ``is_wordlm``
drives look-ahead fusion wiring in speech_recognize (reference :111-166).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from espresso_tpu.models.base import bound_param_dtype
from espresso_tpu.models.speech_lstm import (
    SpeechLSTMConfig,
    scanned_decoder_step,
)
from espresso_tpu.registry import MODELS, register_architecture


@dataclass
class LSTMLMConfig:
    name: str = "lstm_lm_espresso"
    vocab_size: int = 0
    embed_dim: int = 48
    hidden_size: int = 650
    out_embed_dim: int = 650
    num_layers: int = 2
    dropout: float = 0.35
    share_embed: bool = False
    is_wordlm: bool = False
    pad_index: int = 1


def _to_decoder_cfg(cfg: LSTMLMConfig) -> SpeechLSTMConfig:
    return SpeechLSTMConfig(
        vocab_size=cfg.vocab_size,
        decoder_embed_dim=cfg.embed_dim,
        decoder_hidden_size=cfg.hidden_size,
        decoder_out_embed_dim=cfg.out_embed_dim,
        decoder_layers=cfg.num_layers,
        attention_type="none",
        dropout=cfg.dropout,
        share_decoder_input_output_embed=cfg.share_embed,
        pad_index=cfg.pad_index,
    )


@MODELS.register("lstm_lm_espresso", config=LSTMLMConfig)
class LSTMLanguageModel(nn.Module):
    cfg: LSTMLMConfig

    def setup(self):
        # encoder_output_units = 0: LM mode
        self.decoder = scanned_decoder_step(_to_decoder_cfg(self.cfg), 0)

    def init_carry(self, batch_size: int, dtype=jnp.float32):
        cfg = self.cfg
        return (
            jnp.zeros((cfg.num_layers, batch_size, cfg.hidden_size), dtype),
            jnp.zeros((cfg.num_layers, batch_size, cfg.hidden_size), dtype),
            jnp.zeros((batch_size, 0), dtype),
            jnp.zeros((batch_size,), jnp.int32),
        )

    def __call__(
        self, prev_output_tokens: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        B, U = prev_output_tokens.shape
        carry = self.init_carry(B, dtype=bound_param_dtype(self))
        tokens_tm = jnp.moveaxis(prev_output_tokens, 1, 0)
        dummy_enc = jnp.zeros((B, 1, 1))
        dummy_mask = jnp.ones((B, 1), bool)
        _, (logits_tm, _, _) = self.decoder(
            carry, tokens_tm, jnp.zeros((U, B)), dummy_enc, dummy_mask, train, 1.0
        )
        return jnp.moveaxis(logits_tm, 0, 1)

    def decode_step(self, tokens: jnp.ndarray, carry):
        B = tokens.shape[0]
        carry, (logits_tm, _, _) = self.decoder(
            carry, tokens[None], jnp.zeros((1, B)), jnp.zeros((B, 1, 1)),
            jnp.ones((B, 1), bool), False, 1.0,
        )
        return logits_tm[0], carry


@register_architecture("lstm_lm_espresso", "lstm_lm_wsj")
def _arch_lm_wsj(cfg: LSTMLMConfig):
    pass  # defaults


@register_architecture("lstm_lm_espresso", "lstm_wordlm_wsj")
def _arch_wordlm_wsj(cfg: LSTMLMConfig):
    cfg.embed_dim = 1200
    cfg.hidden_size = 1200
    cfg.out_embed_dim = 1200
    cfg.num_layers = 3
    cfg.is_wordlm = True


@register_architecture("lstm_lm_espresso", "lstm_lm_librispeech")
def _arch_lm_librispeech(cfg: LSTMLMConfig):
    cfg.embed_dim = 800
    cfg.hidden_size = 800
    cfg.out_embed_dim = 800
    cfg.num_layers = 4
    cfg.dropout = 0.0


@register_architecture("lstm_lm_espresso", "lstm_lm_swbd")
def _arch_lm_swbd(cfg: LSTMLMConfig):
    cfg.embed_dim = 1800
    cfg.hidden_size = 1800
    cfg.out_embed_dim = 1800
    cfg.num_layers = 3
    cfg.dropout = 0.3
