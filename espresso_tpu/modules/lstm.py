"""LSTM layers as ``lax.scan`` recurrences.

Rebuild of the reference's LSTM usage (packed-sequence biLSTM encoder,
speech_lstm.py:483-531; LSTMCell decoder stack :838-887). TPU-first changes:

  * The input projection ``x @ W`` for all timesteps is hoisted out of the
    scan as one [B, T, 4H] matmul (MXU-friendly); the scan body only does the
    [B, H] x [H, 4H] recurrent matmul and the gate nonlinearity.
  * Packed sequences are replaced by masking: hidden state freezes past each
    row's length, and the backward direction reverses each row *around its own
    length* with a gather, so padding never leaks into valid frames.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _reverse_padded(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Reverse each row of [B, T, ...] within its valid length."""
    B, T = x.shape[0], x.shape[1]
    t = jnp.arange(T)[None, :]
    idx = jnp.where(t < lengths[:, None], lengths[:, None] - 1 - t, t)
    return jnp.take_along_axis(
        x, idx.reshape(B, T, *([1] * (x.ndim - 2))).astype(jnp.int32), axis=1
    ) if x.ndim == 2 else jnp.take_along_axis(
        x, jnp.broadcast_to(idx[..., None], (B, T, x.shape[-1])).astype(jnp.int32), axis=1
    )


def lstm_gates(
    pre: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply (i, f, g, o) gate nonlinearity to preactivations."""
    i, f, g, o = jnp.split(pre, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


class LSTMCell(nn.Module):
    """Single-step LSTM cell; gate order (i, f, g, o). Used by decoders whose
    step functions run inside lax.while_loop beam search."""

    hidden_size: int

    @nn.compact
    def __call__(
        self, carry: Tuple[jnp.ndarray, jnp.ndarray], x: jnp.ndarray
    ) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
        h, c = carry
        pre = nn.Dense(4 * self.hidden_size, name="ih")(x) + nn.Dense(
            4 * self.hidden_size, use_bias=False, name="hh"
        )(h)
        h_new, c_new = lstm_gates(pre, h, c)
        return (h_new, c_new), h_new


class LSTMLayer(nn.Module):
    """One direction of one layer, scanned over time with frozen-past-length
    state. Recurrent weights are explicit params so the scan body is a plain
    jax.lax.scan (no module re-binding per step)."""

    hidden_size: int
    # unroll k scan steps per while-loop iteration: the body's 4 small
    # matmuls are latency/overhead-bound on TPU, so amortizing the loop
    # machinery (and letting XLA share the weight loads) across k steps is
    # a large win at LSTM sizes (measured on the transducer pred-net)
    unroll: int = 8

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, T, D]
        lengths: Optional[jnp.ndarray] = None,
        init_state: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
        B, T, D = x.shape
        H = self.hidden_size
        # hoist input projection out of the scan (one big MXU matmul)
        x_proj = nn.Dense(4 * H, name="ih")(x)  # [B, T, 4H]
        hh_kernel = self.param(
            "hh_kernel", nn.initializers.lecun_normal(), (H, 4 * H)
        )

        if init_state is None:
            h0 = jnp.zeros((B, H), x_proj.dtype)
            c0 = jnp.zeros((B, H), x_proj.dtype)
        else:
            h0, c0 = init_state

        def step(carry, inputs):
            h, c = carry
            xp_t, t = inputs
            pre = xp_t + h @ hh_kernel
            h_new, c_new = lstm_gates(pre, h, c)
            if lengths is not None:
                active = (t < lengths)[:, None]
                h_new = jnp.where(active, h_new, h)
                c_new = jnp.where(active, c_new, c)
            return (h_new, c_new), h_new

        xs = (jnp.moveaxis(x_proj, 1, 0), jnp.arange(T))
        (h_T, c_T), hs = jax.lax.scan(
            step, (h0, c0), xs, unroll=min(self.unroll, T)
        )
        out = jnp.moveaxis(hs, 0, 1)  # [B, T, H]
        if lengths is not None:
            mask = (jnp.arange(T)[None, :] < lengths[:, None])[..., None]
            out = out * mask.astype(out.dtype)
        return out, (h_T, c_T)


class LSTM(nn.Module):
    """Multi-layer (bi)LSTM with optional residual connections
    (reference speech_lstm.py encoder semantics: residual sums between
    layers, dropout between layers)."""

    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False
    dropout: float = 0.0
    residual: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        lengths: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
        h = x
        final_h, final_c = [], []
        for layer in range(self.num_layers):
            fwd, (hf, cf) = LSTMLayer(self.hidden_size, name=f"fwd_{layer}")(
                h, lengths
            )
            if self.bidirectional:
                rev_in = _reverse_padded(h, lengths) if lengths is not None else h[:, ::-1]
                bwd, (hb, cb) = LSTMLayer(self.hidden_size, name=f"bwd_{layer}")(
                    rev_in, lengths
                )
                bwd = (
                    _reverse_padded(bwd, lengths)
                    if lengths is not None
                    else bwd[:, ::-1]
                )
                out = jnp.concatenate([fwd, bwd], axis=-1)
                final_h.append(jnp.concatenate([hf, hb], axis=-1))
                final_c.append(jnp.concatenate([cf, cb], axis=-1))
            else:
                out = fwd
                final_h.append(hf)
                final_c.append(cf)
            if self.residual and layer > 0 and out.shape == h.shape:
                out = out + h
            if self.dropout > 0.0 and train and layer < self.num_layers - 1:
                out = nn.Dropout(rate=self.dropout)(out, deterministic=False)
            h = out
        return h, (jnp.stack(final_h), jnp.stack(final_c))
