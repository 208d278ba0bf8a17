"""TDNN (time-delay NN) model for hybrid HMM-DNN training (``speech_tdnn``).

Rebuild of espresso/models/speech_tdnn.py:30: stacked TdnnBNReLU (:154)
time-delay 1D-conv layers over frames → fc head to pdf-id posteriors, used by
the hybrid xent/LF-MMI path (dump_posteriors → Kaldi decoding).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from espresso_tpu.models.base import EncoderOut
from espresso_tpu.registry import MODELS, register_architecture


@dataclass
class SpeechTdnnConfig:
    name: str = "speech_tdnn"
    feat_dim: int = 80
    vocab_size: int = 0  # num_targets (pdf-ids) for hybrid
    hidden_sizes: Tuple[int, ...] = (640,) * 5
    kernel_sizes: Tuple[int, ...] = (5, 3, 3, 3, 3)
    strides: Tuple[int, ...] = (1,) * 5
    dilations: Tuple[int, ...] = (1, 1, 1, 3, 3)
    num_fc_layers: int = 1  # 2 in some recipes
    dropout: float = 0.0
    norm_type: str = "batch"
    pad_index: int = 1


class TdnnBNReLU(nn.Module):
    """1D conv (time-delay) + norm + ReLU (reference :154)."""

    hidden: int
    kernel: int
    stride: int
    dilation: int
    norm_type: str = "batch"

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray, train: bool = False):
        pad_total = (self.kernel - 1) * self.dilation
        pad = (pad_total // 2, pad_total - pad_total // 2)
        x = nn.Conv(
            self.hidden,
            kernel_size=(self.kernel,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            padding=(pad,),
        )(x)
        if self.norm_type == "batch":
            x = nn.BatchNorm(use_running_average=not train)(x)
        else:
            x = nn.LayerNorm()(x)
        x = nn.relu(x)
        new_lengths = (lengths + pad_total - self.dilation * (self.kernel - 1) - 1) // self.stride + 1
        return x, new_lengths


@MODELS.register("speech_tdnn", config=SpeechTdnnConfig)
class SpeechTdnnModel(nn.Module):
    cfg: SpeechTdnnConfig

    @nn.compact
    def __call__(
        self,
        src_frames: jnp.ndarray,
        src_lengths: jnp.ndarray,
        prev_output_tokens=None,  # parity arg, unused
        train: bool = False,
    ):
        cfg = self.cfg
        x, lengths = src_frames, src_lengths
        for i, (h, k, s, d) in enumerate(
            zip(cfg.hidden_sizes, cfg.kernel_sizes, cfg.strides, cfg.dilations)
        ):
            x, lengths = TdnnBNReLU(h, k, s, d, cfg.norm_type, name=f"tdnn{i}")(
                x, lengths, train=train
            )
            if cfg.dropout > 0.0 and train:
                x = nn.Dropout(rate=cfg.dropout)(x, deterministic=False)
        for j in range(cfg.num_fc_layers - 1):
            x = nn.relu(nn.Dense(cfg.hidden_sizes[-1], name=f"fc{j}")(x))
        logits = nn.Dense(cfg.vocab_size, name="fc_out")(x)
        mask = jnp.arange(x.shape[1])[None, :] < lengths[:, None]
        enc = EncoderOut(
            encoder_out=x, encoder_padding_mask=mask, src_lengths=lengths
        )
        return logits, enc

    def encode(self, src_frames, src_lengths, train: bool = False):
        logits, enc = self(src_frames, src_lengths, train=train)
        return enc


@register_architecture("speech_tdnn", "speech_tdnn_wsj")
def _arch_tdnn_wsj(cfg: SpeechTdnnConfig):
    pass
