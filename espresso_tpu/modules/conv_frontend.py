"""2D convolutional feature front-end (time subsampling).

Rebuild of espresso's ConvBNReLU (espresso/modules/speech_convolutions.py:22):
stacked Conv2D → norm → ReLU over the (time, freq) plane; strides of 2 on time
give the standard 4× subsampling before the encoder
(speech_lstm.py:232-254, speech_transformer_encoder.py:298 pre_encoder).

Norm is configurable: ``batch`` matches the reference (flax BatchNorm with a
``batch_stats`` collection); ``layer`` avoids cross-device stat sync under
data parallelism and is the TPU-friendly default for large meshes.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from espresso_tpu.ops.masking import lengths_after_subsampling


class ConvFrontend(nn.Module):
    out_channels: Sequence[int] = (64, 64, 128, 128)
    kernel_sizes: Sequence[Tuple[int, int]] = ((3, 3), (3, 3), (3, 3), (3, 3))
    strides: Sequence[Tuple[int, int]] = ((1, 1), (2, 2), (1, 1), (2, 2))
    norm_type: str = "batch"  # batch | layer | none

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, lengths: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: [B, T, F] -> ([B, T', C_out * F'], [B] new lengths)."""
        B, T, F = x.shape
        h = x[..., None]  # [B, T, F, 1] — NHWC with (T, F) as spatial dims
        for ch, ks, st in zip(self.out_channels, self.kernel_sizes, self.strides):
            # kaldi-style "same-ish" padding: (k-1)//2 (reference uses
            # padding=(k-1)//2 in speech_convolutions.py)
            pad = ((ks[0] - 1) // 2, ks[0] // 2), ((ks[1] - 1) // 2, ks[1] // 2)
            h = nn.Conv(ch, kernel_size=ks, strides=st, padding=pad)(h)
            if self.norm_type == "batch":
                h = nn.BatchNorm(use_running_average=not train)(h)
            elif self.norm_type == "layer":
                h = nn.LayerNorm()(h)
            h = nn.relu(h)
        Bc, Tc, Fc, Cc = h.shape
        out = h.transpose(0, 1, 3, 2).reshape(Bc, Tc, Cc * Fc)
        # re-anchor to the input (compute) dtype: BatchNorm's fp32 running
        # stats otherwise promote the output — and every downstream matmul —
        # to fp32 under bf16 mixed precision
        out = out.astype(x.dtype)
        new_lengths = self.output_lengths(lengths)
        return out, new_lengths

    def output_lengths(self, lengths: jnp.ndarray) -> jnp.ndarray:
        convs = [
            (ks[0], st[0], (ks[0] - 1) // 2)
            for ks, st in zip(self.kernel_sizes, self.strides)
        ]
        # flax 'same-ish' pad above gives ceil(L/stride) for k=3,p=1:
        # (L + 2*((k-1)//2) + (k%2==0) - k)//s + 1
        out = lengths
        for ks, st in zip(self.kernel_sizes, self.strides):
            total_pad = (ks[0] - 1) // 2 + ks[0] // 2
            out = (out + total_pad - ks[0]) // st[0] + 1
        return out

    def subsampling_factor(self) -> int:
        f = 1
        for st in self.strides:
            f *= st[0]
        return f
