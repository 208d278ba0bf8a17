"""Transducer model: transformer/conformer encoder + LSTM prediction network
+ joint network (``speech_transformer_transducer``).

Rebuild of espresso/models/transformer/speech_transformer_transducer_base.py:41:
encoder → SpeechLSTMDecoder-style prediction net (:203-217, LM mode) → joint
``relu(LN(proj_enc(enc)) + LN(proj_dec(dec)))`` → vocab projection (:71-89,
joint :279-299). ``__call__`` returns the full B×T×U×V lattice (:221-247) for
the RNNT loss; ``joint_step`` evaluates single (enc_frame, pred_state) pairs
for greedy/beam decoding without materializing the lattice.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espresso_tpu.models.base import EncoderOut, bound_param_dtype
from espresso_tpu.models.speech_lstm import (
    SpeechLSTMConfig,
    scanned_decoder_step,
)
from espresso_tpu.models.speech_transformer import (
    SpeechTransformerConfig,
    SpeechTransformerEncoder,
)
from espresso_tpu.registry import MODELS, register_architecture


@dataclass
class TransducerConfig:
    name: str = "speech_transformer_transducer"
    feat_dim: int = 80
    vocab_size: int = 0
    # encoder (shared with speech_transformer config surface)
    encoder: SpeechTransformerConfig = field(
        default_factory=lambda: SpeechTransformerConfig(
            encoder_layer_type="conformer",
            encoder_pos_type="relative",
            encoder_embed_dim=512,
            encoder_ffn_dim=2048,
            encoder_layers=16,
            encoder_heads=8,
        )
    )
    # prediction network (2-layer LSTM, reference yaml)
    pred_embed_dim: int = 512
    pred_hidden_size: int = 512
    pred_layers: int = 2
    pred_dropout: float = 0.1
    # joint
    joint_dim: int = 512
    pad_index: int = 1


class JointNetwork(nn.Module):
    """relu(LN(W_enc enc) + LN(W_dec dec)) -> vocab (reference :71-89)."""

    joint_dim: int
    vocab_size: int

    def setup(self):
        self.proj_enc = nn.Dense(self.joint_dim, name="proj_enc")
        self.proj_dec = nn.Dense(self.joint_dim, name="proj_dec")
        self.ln_enc = nn.LayerNorm(name="ln_enc")
        self.ln_dec = nn.LayerNorm(name="ln_dec")
        self.fc_out = nn.Dense(self.vocab_size, name="fc_out")

    def __call__(self, enc: jnp.ndarray, dec: jnp.ndarray) -> jnp.ndarray:
        """enc: [..., T, D_e]; dec: [..., U, D_d] -> [..., T, U, V]."""
        e = self.ln_enc(self.proj_enc(enc))
        d = self.ln_dec(self.proj_dec(dec))
        joint = nn.relu(e[..., :, None, :] + d[..., None, :, :])
        return self.fc_out(joint)

    def pairwise(self, enc: jnp.ndarray, dec: jnp.ndarray) -> jnp.ndarray:
        """Matched pairs: enc [..., D_e], dec [..., D_d] -> [..., V]."""
        e = self.ln_enc(self.proj_enc(enc))
        d = self.ln_dec(self.proj_dec(dec))
        return self.fc_out(nn.relu(e + d))

    def enc_proj(self, enc: jnp.ndarray) -> jnp.ndarray:
        """Encoder-side projection, precomputable for all frames at once
        (decode fast path: the per-frame joint then only runs the dec side)."""
        return self.ln_enc(self.proj_enc(enc))

    def dec_proj(self, dec: jnp.ndarray) -> jnp.ndarray:
        """Prediction-side projection (fused lattice-free loss path)."""
        return self.ln_dec(self.proj_dec(dec))

    def pairwise_precomputed(
        self, enc_projected: jnp.ndarray, dec: jnp.ndarray
    ) -> jnp.ndarray:
        d = self.ln_dec(self.proj_dec(dec))
        return self.fc_out(nn.relu(enc_projected + d))


@MODELS.register("speech_transformer_transducer", config=TransducerConfig)
class TransducerModel(nn.Module):
    cfg: TransducerConfig

    def setup(self):
        cfg = self.cfg
        enc_cfg = cfg.encoder
        enc_cfg.feat_dim = cfg.feat_dim
        self.encoder = SpeechTransformerEncoder(enc_cfg, name="encoder")
        self._pred_cfg = SpeechLSTMConfig(
            vocab_size=cfg.vocab_size,
            decoder_embed_dim=cfg.pred_embed_dim,
            decoder_hidden_size=cfg.pred_hidden_size,
            decoder_out_embed_dim=cfg.pred_hidden_size,
            decoder_layers=cfg.pred_layers,
            attention_type="none",
            dropout=cfg.pred_dropout,
        )
        self.joint = JointNetwork(cfg.joint_dim, cfg.vocab_size, name="joint")
        self.predictor = scanned_decoder_step(
            self._pred_cfg, 0, compute_logits=False, name="predictor"
        )

    def init_pred_carry(self, batch_size: int, dtype=jnp.float32):
        cfg = self.cfg
        return (
            jnp.zeros((cfg.pred_layers, batch_size, cfg.pred_hidden_size), dtype),
            jnp.zeros((cfg.pred_layers, batch_size, cfg.pred_hidden_size), dtype),
            jnp.zeros((batch_size, 0), dtype),
            jnp.zeros((batch_size,), jnp.int32),
        )

    def predict_sequence(
        self, prev_output_tokens: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        """Prediction-network features for all steps: [B, U, H] (the
        reference feeds decoder.extract_features into the joint, :203-217)."""
        B, U = prev_output_tokens.shape
        carry = self.init_pred_carry(B, dtype=bound_param_dtype(self))
        tokens_tm = jnp.moveaxis(prev_output_tokens, 1, 0)
        dummy_enc = jnp.zeros((B, 1, 1))
        dummy_mask = jnp.ones((B, 1), bool)
        _, (_, feats_tm, _) = self.predictor(
            carry, tokens_tm, jnp.zeros((U, B)), dummy_enc, dummy_mask, train, 1.0
        )
        return jnp.moveaxis(feats_tm, 0, 1)

    def __call__(
        self,
        src_frames: jnp.ndarray,
        src_lengths: jnp.ndarray,
        prev_output_tokens: jnp.ndarray,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, EncoderOut]:
        """Full-lattice forward: returns ([B, T, U, V] logits, encoder_out)."""
        enc = self.encoder(src_frames, src_lengths, train=train)
        pred = self.predict_sequence(prev_output_tokens, train=train)
        lattice = self.joint(enc.encoder_out, pred)
        return lattice, enc

    def encode(self, src_frames, src_lengths, train: bool = False) -> EncoderOut:
        return self.encoder(src_frames, src_lengths, train=train)

    def pred_step(self, tokens: jnp.ndarray, carry):
        """One prediction-net step: tokens [B] -> (pred_feat [B, H], carry)."""
        B = tokens.shape[0]
        carry, (_, feat_tm, _) = self.predictor(
            carry, tokens[None], jnp.zeros((1, B)), jnp.zeros((B, 1, 1)),
            jnp.ones((B, 1), bool), False, 1.0,
        )
        return feat_tm[0], carry

    def joint_step(self, enc_frame: jnp.ndarray, pred_feat: jnp.ndarray):
        """Joint on matched pairs: [B, D_e] x [B, H] -> [B, V] logits."""
        return self.joint.pairwise(enc_frame, pred_feat)

    def joint_enc_proj(self, enc_out: jnp.ndarray) -> jnp.ndarray:
        """Precompute the joint's encoder projection: [B, T, D_e] -> [B, T, J]."""
        return self.joint.enc_proj(enc_out)

    def forward_fused(
        self,
        src_frames: jnp.ndarray,
        src_lengths: jnp.ndarray,
        prev_output_tokens: jnp.ndarray,
        train: bool = False,
    ):
        """Lattice-free training forward: returns (enc_proj [B,T,J],
        dec_proj [B,U+1,J], encoder_out) for ops/rnnt_fused.rnnt_loss_fused —
        the B×T×U×V joint lattice is never materialized."""
        enc = self.encoder(src_frames, src_lengths, train=train)
        pred = self.predict_sequence(prev_output_tokens, train=train)
        return (
            self.joint.enc_proj(enc.encoder_out),
            self.joint.dec_proj(pred),
            enc,
        )

    def joint_step_precomputed(
        self, enc_projected: jnp.ndarray, pred_feat: jnp.ndarray
    ):
        """Joint with precomputed encoder side: [B, J] x [B, H] -> [B, V]."""
        return self.joint.pairwise_precomputed(enc_projected, pred_feat)


@register_architecture(
    "speech_transformer_transducer", "conformer_transducer_librispeech"
)
def _arch_conformer_transducer(cfg: TransducerConfig):
    # reference examples/asr_librispeech/config/
    # conformer_transducer_librispeech.yaml:28-92
    cfg.encoder.encoder_layer_type = "conformer"
    cfg.encoder.encoder_pos_type = "relative"
    cfg.encoder.encoder_embed_dim = 512
    cfg.encoder.encoder_ffn_dim = 2048
    cfg.encoder.encoder_layers = 16
    cfg.encoder.encoder_heads = 8
    cfg.encoder.depthwise_conv_kernel_size = 31
    cfg.pred_layers = 2
    cfg.pred_hidden_size = 512
    cfg.joint_dim = 512
