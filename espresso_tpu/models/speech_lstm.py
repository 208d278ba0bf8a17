"""LSTM encoder-decoder ASR model (``speech_lstm``).

Rebuild of espresso/models/speech_lstm.py:169 with identical capability
surface, re-designed for XLA:

  * Encoder (:358): ConvFrontend 2D-conv subsampling → multi-layer (bi)LSTM.
    Packed sequences become masked ``lax.scan`` recurrences with
    per-row-length reversal for the backward direction.
  * Decoder (:600): stacked LSTMCells with **input feeding** (:839-843),
    Bahdanau/Luong attention computed from the 1st layer's hidden state
    (:853-861), residual sums from layer 2 (:869-876), optional
    **scheduled sampling** (:717-764) — the reference's per-timestep Python
    loop becomes one ``nn.scan`` over U; single-step decoding reuses the same
    scanned module with U=1 and an explicit carry, so beam search state
    reorder is a pure gather (replaces masked_copy_cached_state :1001).
  * Named architectures speech_conv_lstm_{wsj,librispeech,swbd} (:1099-1123).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espresso_tpu.models.base import EncoderOut, bound_param_dtype
from espresso_tpu.modules.conv_frontend import ConvFrontend
from espresso_tpu.modules.lstm import LSTM, lstm_gates
from espresso_tpu.modules.speech_attention import BahdanauAttention, LuongAttention
from espresso_tpu.registry import MODELS, register_architecture


@dataclass
class SpeechLSTMConfig:
    name: str = "speech_lstm"
    feat_dim: int = 80
    vocab_size: int = 0  # filled by the task
    # encoder conv front-end (reference evaluatable strings :46-57)
    conv_channels: Tuple[int, ...] = (64, 64, 128, 128)
    conv_kernel_sizes: Tuple[Tuple[int, int], ...] = ((3, 3),) * 4
    conv_strides: Tuple[Tuple[int, int], ...] = ((1, 1), (2, 2), (1, 1), (2, 2))
    conv_norm_type: str = "batch"
    # encoder LSTM
    encoder_hidden_size: int = 512
    encoder_layers: int = 3
    encoder_bidirectional: bool = True
    encoder_residual: bool = False
    # decoder
    decoder_embed_dim: int = 48
    decoder_hidden_size: int = 512
    decoder_out_embed_dim: int = 960
    decoder_layers: int = 3
    decoder_residual: bool = False
    attention_type: str = "bahdanau"  # bahdanau | luong | none
    attention_dim: int = 320
    share_decoder_input_output_embed: bool = False
    dropout: float = 0.3
    pad_index: int = 1


class SpeechLSTMEncoder(nn.Module):
    cfg: SpeechLSTMConfig

    @nn.compact
    def __call__(
        self, src_frames: jnp.ndarray, src_lengths: jnp.ndarray, train: bool = False
    ) -> EncoderOut:
        cfg = self.cfg
        x, lengths = ConvFrontend(
            out_channels=cfg.conv_channels,
            kernel_sizes=cfg.conv_kernel_sizes,
            strides=cfg.conv_strides,
            norm_type=cfg.conv_norm_type,
            name="conv",
        )(src_frames, src_lengths, train=train)
        if cfg.dropout > 0.0 and train:
            x = nn.Dropout(rate=cfg.dropout)(x, deterministic=False)
        x, _ = LSTM(
            hidden_size=cfg.encoder_hidden_size,
            num_layers=cfg.encoder_layers,
            bidirectional=cfg.encoder_bidirectional,
            dropout=cfg.dropout,
            residual=cfg.encoder_residual,
            name="lstm",
        )(x, lengths, train=train)
        mask = jnp.arange(x.shape[1])[None, :] < lengths[:, None]
        return EncoderOut(
            encoder_out=x, encoder_padding_mask=mask, src_lengths=lengths
        )

    def output_units(self) -> int:
        return self.cfg.encoder_hidden_size * (
            2 if self.cfg.encoder_bidirectional else 1
        )


class _DecoderStep(nn.Module):
    """One decoder timestep; scanned over U for training, called with U=1 for
    incremental decoding. Carry: (h [L,B,H], c [L,B,H], input_feed [B,C],
    prev_pred [B]). ``train``/``ss_prob`` arrive as broadcast (static) inputs
    so one scanned instance serves training and decoding with shared params."""

    cfg: SpeechLSTMConfig
    encoder_output_units: int
    compute_logits: bool = True  # False: feature extractor (transducer pred-net)

    @nn.compact
    def __call__(self, carry, token, coin, enc_out, enc_mask, train, ss_prob):
        cfg = self.cfg
        h_prev, c_prev, input_feed, prev_pred = carry

        has_encoder = self.encoder_output_units > 0

        # ss_prob may be a static Python float (1.0 = teacher forcing, branch
        # compiled out) or a traced scalar (scheduled sampling without
        # per-epoch recompiles)
        ss_active = not isinstance(ss_prob, (int, float)) or ss_prob < 1.0
        if ss_active:
            token = jnp.where(coin < ss_prob, token, prev_pred)

        embed = nn.Embed(
            cfg.vocab_size, cfg.decoder_embed_dim, name="embed_tokens"
        )
        emb = embed(token)
        if cfg.dropout > 0.0 and train:
            emb = nn.Dropout(rate=cfg.dropout, name="drop_in")(
                emb, deterministic=False
            )

        if cfg.attention_type == "bahdanau":
            attention = BahdanauAttention(cfg.attention_dim, name="attention")
        elif cfg.attention_type == "luong":
            attention = LuongAttention(name="attention")
        else:
            attention = None

        x = jnp.concatenate([emb, input_feed], axis=-1) if has_encoder else emb
        hs, cs = [], []
        context = input_feed
        attn_weights = None
        for i in range(cfg.decoder_layers):
            pre = nn.Dense(4 * cfg.decoder_hidden_size, name=f"cell{i}_ih")(
                x
            ) + nn.Dense(
                4 * cfg.decoder_hidden_size, use_bias=False, name=f"cell{i}_hh"
            )(h_prev[i])
            hidden, cell = lstm_gates(pre, h_prev[i], c_prev[i])
            hs.append(hidden)
            cs.append(cell)
            prev_layer_hidden = x[:, : hidden.shape[1]]
            if has_encoder:
                if i == 0 and attention is not None:
                    context, attn_weights = attention(hidden, enc_out, enc_mask)
                x = jnp.concatenate([hidden, context], axis=-1)
            else:
                x = hidden
            if cfg.dropout > 0.0 and train:
                x = nn.Dropout(rate=cfg.dropout, name=f"drop{i}")(
                    x, deterministic=False
                )
            if cfg.decoder_residual and i > 0:
                if has_encoder:
                    x = jnp.concatenate(
                        [
                            x[:, : hidden.shape[1]] + prev_layer_hidden,
                            x[:, hidden.shape[1] :],
                        ],
                        axis=-1,
                    )
                else:
                    x = x + prev_layer_hidden

        out = x  # [B, H + C]
        out_dim = cfg.decoder_hidden_size + self.encoder_output_units
        if out_dim != cfg.decoder_out_embed_dim:
            out = nn.Dense(cfg.decoder_out_embed_dim, name="additional_fc")(out)
        if self.compute_logits:
            if cfg.share_decoder_input_output_embed:
                logits = embed.attend(out)
            else:
                logits = nn.Dense(cfg.vocab_size, name="fc_out")(out)
        else:
            logits = None
        if ss_active and logits is not None:
            new_pred = jnp.argmax(logits, axis=-1).astype(token.dtype)
        else:
            new_pred = token
        new_carry = (jnp.stack(hs), jnp.stack(cs), context, new_pred)
        return new_carry, (logits, out, attn_weights)


def scanned_decoder_step(
    cfg: SpeechLSTMConfig,
    encoder_output_units: int,
    compute_logits: bool = True,
    name: str = "decoder",
    unroll: int = 8,
):
    """nn.scan over _DecoderStep; inputs = (tokens [U,B], coin [U,B],
    enc_out*, enc_mask*, train*, ss_prob*) where * are broadcast. ``unroll``
    amortizes the while-loop overhead of the small per-step matmuls."""
    return nn.scan(
        _DecoderStep,
        variable_broadcast="params",
        split_rngs={"params": False, "dropout": True},
        in_axes=(0, 0, nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
        out_axes=0,
        unroll=unroll,
    )(cfg, encoder_output_units, compute_logits=compute_logits, name=name)


@MODELS.register("speech_lstm", config=SpeechLSTMConfig)
class SpeechLSTMModel(nn.Module):
    """Attention-based LSTM encoder-decoder (reference speech_lstm :169)."""

    cfg: SpeechLSTMConfig

    def setup(self):
        self.encoder = SpeechLSTMEncoder(self.cfg, name="encoder")
        enc_units = self.cfg.encoder_hidden_size * (
            2 if self.cfg.encoder_bidirectional else 1
        )
        self._enc_units = enc_units if self.cfg.attention_type != "none" else 0
        self.decoder = scanned_decoder_step(self.cfg, self._enc_units)

    def init_decoder_carry(self, batch_size: int, dtype=jnp.float32):
        cfg = self.cfg
        L, H = cfg.decoder_layers, cfg.decoder_hidden_size
        return (
            jnp.zeros((L, batch_size, H), dtype),
            jnp.zeros((L, batch_size, H), dtype),
            jnp.zeros((batch_size, self._enc_units), dtype),
            jnp.zeros((batch_size,), jnp.int32),
        )

    def __call__(
        self,
        src_frames: jnp.ndarray,
        src_lengths: jnp.ndarray,
        prev_output_tokens: jnp.ndarray,
        train: bool = False,
        ss_prob: float = 1.0,
    ) -> Tuple[jnp.ndarray, EncoderOut]:
        """Teacher-forced forward: returns (logits [B, U, V], encoder_out)."""
        enc = self.encoder(src_frames, src_lengths, train=train)
        logits, _ = self.decode_sequence(
            prev_output_tokens, enc, train=train, ss_prob=ss_prob
        )
        return logits, enc

    def decode_sequence(
        self,
        prev_output_tokens: jnp.ndarray,
        enc: Optional[EncoderOut],
        train: bool = False,
        ss_prob: float = 1.0,
    ):
        B, U = prev_output_tokens.shape
        cdtype = (
            enc.encoder_out.dtype if enc is not None
            else bound_param_dtype(self)
        )
        carry = self.init_decoder_carry(B, dtype=cdtype)
        tokens_tm = jnp.moveaxis(prev_output_tokens, 1, 0)  # [U, B]
        ss_active = not isinstance(ss_prob, (int, float)) or ss_prob < 1.0
        if ss_active and train:
            coin = jax.random.uniform(self.make_rng("sampling"), (U, B))
        else:
            coin = jnp.zeros((U, B))
        enc_out = enc.encoder_out if enc is not None else jnp.zeros((B, 1, 1))
        enc_mask = (
            enc.encoder_padding_mask if enc is not None else jnp.ones((B, 1), bool)
        )
        carry, (logits_tm, _, attn_tm) = self.decoder(
            carry, tokens_tm, coin, enc_out, enc_mask, train, ss_prob
        )
        logits = jnp.moveaxis(logits_tm, 0, 1)  # [B, U, V]
        attn = jnp.moveaxis(attn_tm, 0, 1) if attn_tm is not None else None
        return logits, (carry, attn)

    def encode(self, src_frames, src_lengths, train: bool = False) -> EncoderOut:
        return self.encoder(src_frames, src_lengths, train=train)

    def decode_step(self, tokens: jnp.ndarray, carry, enc: Optional[EncoderOut]):
        """One incremental step: tokens [B] -> (logits [B, V], new_carry)."""
        B = tokens.shape[0]
        enc_out = enc.encoder_out if enc is not None else jnp.zeros((B, 1, 1))
        enc_mask = (
            enc.encoder_padding_mask if enc is not None else jnp.ones((B, 1), bool)
        )
        carry, (logits_tm, _, attn_tm) = self.decoder(
            carry, tokens[None], jnp.zeros((1, B)), enc_out, enc_mask, False, 1.0
        )
        attn = attn_tm[0] if attn_tm is not None else None
        return logits_tm[0], carry, attn


# -- named architectures (reference speech_lstm.py:1099-1123) ----------------


@register_architecture("speech_lstm", "speech_conv_lstm_wsj")
def _arch_wsj(cfg: SpeechLSTMConfig):
    cfg.encoder_hidden_size = 320
    cfg.encoder_layers = 3
    cfg.decoder_embed_dim = 48
    cfg.decoder_hidden_size = 320
    cfg.decoder_out_embed_dim = 960
    cfg.decoder_layers = 3
    cfg.attention_dim = 320


@register_architecture("speech_lstm", "speech_conv_lstm_librispeech")
def _arch_librispeech(cfg: SpeechLSTMConfig):
    cfg.encoder_hidden_size = 1024
    cfg.encoder_layers = 4
    cfg.decoder_embed_dim = 48
    cfg.decoder_hidden_size = 1024
    cfg.decoder_out_embed_dim = 3072
    cfg.decoder_layers = 3
    cfg.attention_dim = 512
    cfg.dropout = 0.4


@register_architecture("speech_lstm", "speech_conv_lstm_swbd")
def _arch_swbd(cfg: SpeechLSTMConfig):
    cfg.encoder_hidden_size = 640
    cfg.encoder_layers = 4
    cfg.decoder_embed_dim = 64
    cfg.decoder_hidden_size = 640
    cfg.decoder_out_embed_dim = 1920
    cfg.decoder_layers = 3
    cfg.attention_dim = 640
    cfg.dropout = 0.5
