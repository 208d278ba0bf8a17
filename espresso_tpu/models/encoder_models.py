"""Encoder-only models with an output head (CTC / hybrid).

Rebuild of espresso/models/transformer/speech_transformer_encoder_model.py:35
(``speech_transformer_encoder_model``: transformer/conformer encoder + output
projection for CTC or hybrid) and espresso/models/speech_lstm_encoder_model.py:32
(``speech_lstm_encoder_model`` with chunked streaming support for hybrid).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from espresso_tpu.models.base import EncoderOut
from espresso_tpu.models.speech_lstm import SpeechLSTMConfig, SpeechLSTMEncoder
from espresso_tpu.models.speech_transformer import (
    SpeechTransformerConfig,
    SpeechTransformerEncoder,
)
from espresso_tpu.registry import MODELS, register_architecture


@dataclass
class TransformerEncoderModelConfig:
    name: str = "speech_transformer_encoder_model"
    feat_dim: int = 80
    vocab_size: int = 0
    encoder: SpeechTransformerConfig = field(
        default_factory=SpeechTransformerConfig
    )
    pad_index: int = 1


@MODELS.register(
    "speech_transformer_encoder_model", config=TransformerEncoderModelConfig
)
class SpeechTransformerEncoderModel(nn.Module):
    cfg: TransformerEncoderModelConfig

    def setup(self):
        enc_cfg = self.cfg.encoder
        enc_cfg.feat_dim = self.cfg.feat_dim
        self.encoder = SpeechTransformerEncoder(enc_cfg, name="encoder")
        self.fc_out = nn.Dense(self.cfg.vocab_size, name="fc_out")

    def __call__(
        self,
        src_frames: jnp.ndarray,
        src_lengths: jnp.ndarray,
        prev_output_tokens=None,  # parity arg, unused
        train: bool = False,
    ) -> Tuple[jnp.ndarray, EncoderOut]:
        enc = self.encoder(src_frames, src_lengths, train=train)
        logits = self.fc_out(enc.encoder_out)
        return logits, enc

    def encode(self, src_frames, src_lengths, train: bool = False) -> EncoderOut:
        return self.encoder(src_frames, src_lengths, train=train)


@dataclass
class LSTMEncoderModelConfig:
    name: str = "speech_lstm_encoder_model"
    feat_dim: int = 80
    vocab_size: int = 0
    encoder: SpeechLSTMConfig = field(default_factory=SpeechLSTMConfig)
    pad_index: int = 1


@MODELS.register("speech_lstm_encoder_model", config=LSTMEncoderModelConfig)
class SpeechLSTMEncoderModel(nn.Module):
    cfg: LSTMEncoderModelConfig

    def setup(self):
        enc_cfg = self.cfg.encoder
        enc_cfg.feat_dim = self.cfg.feat_dim
        self.encoder = SpeechLSTMEncoder(enc_cfg, name="encoder")
        self.fc_out = nn.Dense(self.cfg.vocab_size, name="fc_out")

    def __call__(
        self,
        src_frames: jnp.ndarray,
        src_lengths: jnp.ndarray,
        prev_output_tokens=None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, EncoderOut]:
        enc = self.encoder(src_frames, src_lengths, train=train)
        logits = self.fc_out(enc.encoder_out)
        return logits, enc

    def encode(self, src_frames, src_lengths, train: bool = False) -> EncoderOut:
        return self.encoder(src_frames, src_lengths, train=train)


@register_architecture(
    "speech_transformer_encoder_model", "transformer_ctc_librispeech"
)
def _arch_ctc_librispeech(cfg: TransformerEncoderModelConfig):
    cfg.encoder.encoder_embed_dim = 512
    cfg.encoder.encoder_ffn_dim = 2048
    cfg.encoder.encoder_layers = 12
    cfg.encoder.encoder_heads = 8
