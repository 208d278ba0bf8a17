"""Chunked lattice-free RNNT loss: bounded memory with MXU-batched joints.

The transducer's memory cliff is the B×T×(U+1)×V joint lattice (SURVEY.md §5;
the reference mitigates only by T·U batching, asr_dataset.py:369-382). This
implementation scans over *chunks* of C encoder frames: each step materializes
only the chunk's joint logits [B, C, U+1, V] with one batched MXU matmul,
consumes them into the alpha recurrence, and discards them — peak extra
memory is T/C times smaller than the full lattice while keeping the matmuls
large. (A fully frame-sequential variant was 7x slower than the lattice on
v5e because per-frame [B·U, J]x[J, V] matmuls serialize; chunking restores
the arithmetic intensity.)

The backward pass (``jax.custom_vjp``) recomputes each chunk's joint in a
reverse scan, forms denominator occupancies from alpha/beta, chains
analytically through log-softmax and the vocabulary projection, and
accumulates gradients for (enc_proj, dec_proj, fc_kernel, fc_bias); upstream
projections/LayerNorms get gradients via normal autodiff on those inputs.

Verified against ops/rnnt.py (lattice) for values and gradients.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp

from espresso_tpu.ops.rnnt import _log_chain_scan

NEG_INF = -1.0e30
# v5e sweep at the flagship operating point (B=16, T=256, U=100, V=1024):
# fwd+bwd ms by chunk: C=2 27.3, C=4 26.8, C=8 26.7, C=16 34.5, C=32 42.3 —
# the [B, C, U1, V] fp32 logits buffer is HBM-bound, so smaller chunks win
# until scan overhead bites; 8 is the floor
DEFAULT_CHUNK = 8


def _pad_T(x, C):
    T = x.shape[1]
    T_pad = -(-T // C) * C
    if T_pad != T:
        x = jnp.pad(x, ((0, 0), (0, T_pad - T), (0, 0)))
    return x, T_pad


def _chunk_transitions(enc_chunk, dec_proj, fc_kernel, fc_bias, tgt, blank):
    """Joint over one chunk: enc_chunk [B, C, J] -> (lpb, lpl [B, C, U1],
    pre [B, C, U1, J], lp [B, C, U1, V]).

    Matmuls run in the caller's dtype (bf16 under mixed precision — MXU
    speed and half the HBM traffic for the [B, C, U1, *] tensors) with fp32
    accumulation; the log-softmax and the downstream alpha/beta recursions
    are fp32."""
    pre = jax.nn.relu(enc_chunk[:, :, None, :] + dec_proj[:, None, :, :])
    logits = (
        jnp.einsum(
            "bcuj,jv->bcuv", pre, fc_kernel, preferred_element_type=jnp.float32
        )
        + fc_bias.astype(jnp.float32)
    )
    lp = jax.nn.log_softmax(logits, axis=-1)
    lpb = lp[..., blank]
    B, C, U1 = lpb.shape
    lpl = jnp.take_along_axis(
        lp, jnp.broadcast_to(tgt[:, None, :, None], (B, C, U1, 1)), axis=-1
    )[..., 0]
    u_idx = jnp.arange(U1)[None, None, :]
    lpl = jnp.where(u_idx < U1 - 1, lpl, NEG_INF)
    return lpb, lpl, pre, lp


def _alpha_scan(
    enc_proj, dec_proj, fc_kernel, fc_bias, tgt, src_lengths, tgt_lengths, blank, C
):
    """Chunked forward. Returns (logZ [B], alphas [T_pad, B, U1])."""
    B, T_pad, J = enc_proj.shape
    U1 = dec_proj.shape[1]
    u_idx = jnp.arange(U1)[None, :]
    valid_u = u_idx <= tgt_lengths[:, None]
    n_chunks = T_pad // C
    enc_chunks = enc_proj.reshape(B, n_chunks, C, J)

    # frame 0 initial alpha: label chain from the origin (uses frame-0 lp)
    lpb0, lpl0, _, _ = _chunk_transitions(
        enc_chunks[:, 0, :1], dec_proj, fc_kernel, fc_bias, tgt, blank
    )
    shifted0 = jnp.concatenate(
        [jnp.zeros((B, 1)), lpl0[:, 0, :-1]], axis=1
    )
    alpha0 = jnp.where(valid_u, jnp.cumsum(shifted0, axis=1), NEG_INF)

    def chunk_step_offset(carry, k):
        """Step c computes alpha AT frame k*C+c from frame k*C+c-1; the
        previous frame's blank lp rides the carry across chunk borders."""
        alpha_in, lpb_prev = carry
        enc_c = jax.lax.dynamic_index_in_dim(enc_chunks, k, axis=1, keepdims=False)
        lpb, lpl, _, _ = _chunk_transitions(
            enc_c, dec_proj, fc_kernel, fc_bias, tgt, blank
        )

        def step(inner, c):
            alpha_prev, lpb_prev_f = inner
            t = k * C + c
            from_blank = alpha_prev + lpb_prev_f
            cvec = jnp.concatenate(
                [jnp.full((B, 1), NEG_INF), lpl[:, c, :-1]], axis=1
            )
            alpha_t = _log_chain_scan(from_blank, cvec)
            alpha_t = jnp.where(valid_u, alpha_t, NEG_INF)
            first = t == 0
            alpha_t = jnp.where(first, alpha_prev, alpha_t)
            active = (t < src_lengths)[:, None]
            alpha_t = jnp.where(active, alpha_t, alpha_prev)
            lpb_keep = jnp.where(active, lpb[:, c], lpb_prev_f)
            return (alpha_t, lpb_keep), alpha_t

        (alpha_out, lpb_last), alphas_c = jax.lax.scan(
            step, (alpha_in, lpb_prev), jnp.arange(C)
        )
        return (alpha_out, lpb_last), alphas_c

    (alpha_last, lpb_last), alphas = jax.lax.scan(
        chunk_step_offset, (alpha0, jnp.zeros((B, U1))), jnp.arange(n_chunks)
    )
    alphas = alphas.reshape(n_chunks * C, B, U1)  # alphas[t] = alpha AT frame t
    alpha_end = jnp.take_along_axis(alpha_last, tgt_lengths[:, None], axis=1)[:, 0]
    lpb_end = jnp.take_along_axis(lpb_last, tgt_lengths[:, None], axis=1)[:, 0]
    return alpha_end + lpb_end, alphas


# Pallas joint-kernel path selector: "auto" (default) uses the kernels on
# TPU when the shape gate passes, "on" forces them, "off" forces the XLA
# chunked path, "interpret" runs the kernels in interpreter mode (CPU
# parity tests). The round-2 Mosaic blocker (single-row bf16 vector.load
# from a multi-row VMEM tile failing ApplyVectorLayout) was fixed by
# full-tile loads + one-hot sublane mask-reduce (ops/rnnt_pallas.py);
# real-v5e A/B at the flagship point (B=16 T=256 U=100 J=512 V=1024):
# Pallas 18.1 ms vs XLA chunked 32.7 ms fwd+bwd (1.81x) — see bench_rnnt.py.
PALLAS_MODE = os.environ.get("ESPRESSO_RNNT_PALLAS", "auto")


def rnnt_loss_fused(
    enc_proj, dec_proj, fc_kernel, fc_bias, targets, src_lengths, tgt_lengths,
    blank, chunk_size=DEFAULT_CHUNK,
):
    """Lattice-free transducer NLL [B]. On TPU the Pallas joint kernels
    (ops/rnnt_pallas.py — the [B,T,U1,V] tensor never touches HBM) are the
    default when the shape gate passes (1.81x over the XLA chunked path at
    flagship shapes, bench_rnnt.py); the XLA chunked path below is the
    fallback and the CPU/GPU path (see PALLAS_MODE above)."""
    from espresso_tpu.ops.rnnt_pallas import (
        rnnt_loss_fused_pallas,
        supports_rnnt_pallas,
    )

    U1 = dec_proj.shape[1]
    J = enc_proj.shape[2]
    V = fc_kernel.shape[1]
    if PALLAS_MODE == "interpret" or (
        PALLAS_MODE in ("auto", "on") and supports_rnnt_pallas(U1, J, V)
    ):
        return rnnt_loss_fused_pallas(
            enc_proj, dec_proj, fc_kernel, fc_bias, targets, src_lengths,
            tgt_lengths, blank, PALLAS_MODE == "interpret",
        )
    return rnnt_loss_fused_xla(
        enc_proj, dec_proj, fc_kernel, fc_bias, targets, src_lengths,
        tgt_lengths, blank, chunk_size,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def rnnt_loss_fused_xla(
    enc_proj, dec_proj, fc_kernel, fc_bias, targets, src_lengths, tgt_lengths,
    blank, chunk_size=DEFAULT_CHUNK,
):
    B = enc_proj.shape[0]
    tgt = jnp.concatenate(
        [targets.astype(jnp.int32), jnp.zeros((B, 1), jnp.int32)], axis=1
    )
    # keep the joint matmul inputs in the caller's dtype (bf16 under
    # mixed precision); _chunk_transitions accumulates fp32 and the DP
    # recursions run entirely in fp32
    enc_p, _ = _pad_T(enc_proj, chunk_size)
    logZ, _ = _alpha_scan(
        enc_p,
        dec_proj,
        fc_kernel,
        fc_bias,
        tgt,
        src_lengths,
        tgt_lengths,
        blank,
        chunk_size,
    )
    return -logZ


def _fused_fwd(enc_proj, dec_proj, fc_kernel, fc_bias, targets, src_lengths,
               tgt_lengths, blank, chunk_size):
    B = enc_proj.shape[0]
    tgt = jnp.concatenate(
        [targets.astype(jnp.int32), jnp.zeros((B, 1), jnp.int32)], axis=1
    )
    enc_p, _ = _pad_T(enc_proj, chunk_size)
    logZ, alphas = _alpha_scan(
        enc_p, dec_proj, fc_kernel, fc_bias, tgt, src_lengths, tgt_lengths,
        blank, chunk_size,
    )
    # stash (logZ, alphas) — [T_pad, B, U1] fp32 is ~MBs, while re-running
    # the alpha scan in the backward cost ~1/3 of the whole loss bwd
    return -logZ, (
        enc_proj, dec_proj, fc_kernel, fc_bias, targets, src_lengths,
        tgt_lengths, logZ, alphas,
    )


def _fused_bwd(blank, chunk_size, res, g):
    (
        enc_proj,
        dec_proj,
        fc_kernel,
        fc_bias,
        targets,
        src_lengths,
        tgt_lengths,
        logZ,
        alphas,
    ) = res
    C = chunk_size
    T = enc_proj.shape[1]
    enc_p, T_pad = _pad_T(enc_proj, C)
    dec_p = dec_proj
    W = fc_kernel
    bb = fc_bias
    B, _, J = enc_p.shape
    U1 = dec_p.shape[1]
    V = fc_bias.shape[0]
    tgt = jnp.concatenate(
        [targets.astype(jnp.int32), jnp.zeros((B, 1), jnp.int32)], axis=1
    )
    u_idx = jnp.arange(U1)[None, :]
    valid_u = u_idx <= tgt_lengths[:, None]
    n_chunks = T_pad // C
    enc_chunks = enc_p.reshape(B, n_chunks, C, J)

    alphas_chunks = alphas.reshape(n_chunks, C, B, U1)

    onehot_tgt = jax.nn.one_hot(tgt, V, dtype=jnp.float32)  # [B, U1, V]
    blank_vec = jax.nn.one_hot(blank, V, dtype=jnp.float32)  # [V]

    def chunk_bwd(carry, k):
        beta_next, g_dec, g_W, g_b = carry
        enc_c = jax.lax.dynamic_index_in_dim(enc_chunks, k, axis=1, keepdims=False)
        lpb, lpl, pre, lp = _chunk_transitions(enc_c, dec_p, W, bb, tgt, blank)
        alphas_c = jax.lax.dynamic_index_in_dim(
            alphas_chunks, k, axis=0, keepdims=False
        )  # [C, B, U1]

        def frame_bwd(inner, c_rev):
            beta_nxt = inner
            c = C - 1 - c_rev
            t = k * C + c
            lpb_t, lpl_t = lpb[:, c], lpl[:, c]
            from_blank = lpb_t + beta_nxt
            a_rev = jnp.flip(from_blank, axis=1)
            c_rev_vec = jnp.flip(lpl_t, axis=1)
            beta_t = jnp.flip(_log_chain_scan(a_rev, c_rev_vec), axis=1)
            beta_t = jnp.where(valid_u, beta_t, NEG_INF)
            lpb_final = jnp.take_along_axis(lpb_t, tgt_lengths[:, None], axis=1)
            masked_label = jnp.where(u_idx < tgt_lengths[:, None], lpl_t, 0.0)
            suffix = jnp.flip(
                jnp.cumsum(jnp.flip(masked_label, axis=1), axis=1), axis=1
            )
            beta_last = jnp.where(valid_u, suffix + lpb_final, NEG_INF)
            is_last = (t == src_lengths - 1)[:, None]
            beta_t = jnp.where(is_last, beta_last, beta_t)
            inactive = (t >= src_lengths)[:, None]
            beta_t = jnp.where(inactive, beta_nxt, beta_t)

            alpha_t = alphas_c[c]
            is_terminal = is_last & (u_idx == tgt_lengths[:, None])
            beta_after_blank = jnp.where(is_terminal, 0.0, beta_nxt)
            occ_blank = jnp.exp(alpha_t + lpb_t + beta_after_blank - logZ[:, None])
            beta_right = jnp.concatenate(
                [beta_t[:, 1:], jnp.full((B, 1), NEG_INF)], axis=1
            )
            occ_label = jnp.exp(alpha_t + lpl_t + beta_right - logZ[:, None])
            frame_valid = (t < src_lengths)[:, None] & valid_u
            occ_blank = jnp.where(frame_valid, occ_blank, 0.0)
            occ_label = jnp.where(
                frame_valid & (u_idx < tgt_lengths[:, None]), occ_label, 0.0
            )
            return beta_t, (occ_blank, occ_label)

        beta_out, (occ_blank_rev, occ_label_rev) = jax.lax.scan(
            frame_bwd, beta_next, jnp.arange(C)
        )
        occ_blank = jnp.flip(occ_blank_rev, axis=0)  # [C, B, U1]
        occ_label = jnp.flip(occ_label_rev, axis=0)
        occ_blank = jnp.moveaxis(occ_blank, 0, 1)  # [B, C, U1]
        occ_label = jnp.moveaxis(occ_label, 0, 1)

        # batched grads for the whole chunk
        g_lp = -(
            occ_blank[..., None] * blank_vec
            + occ_label[..., None] * onehot_tgt[:, None]
        ) * g[:, None, None, None]
        sum_glp = g_lp.sum(axis=-1, keepdims=True)
        g_logits = g_lp - jnp.exp(lp) * sum_glp  # [B, C, U1, V]
        g_b = g_b + g_logits.sum(axis=(0, 1, 2))
        # matmuls in the joint's dtype (bf16 under mixed precision),
        # fp32 accumulation via preferred_element_type
        g_log_mm = g_logits.astype(W.dtype)
        g_W = g_W + jnp.einsum(
            "bcuj,bcuv->jv", pre, g_log_mm, preferred_element_type=jnp.float32
        )
        g_pre = jnp.einsum(
            "bcuv,jv->bcuj", g_log_mm, W, preferred_element_type=jnp.float32
        ) * (pre > 0)
        g_enc_c = g_pre.sum(axis=2)  # [B, C, J]
        g_dec = g_dec + g_pre.sum(axis=1)  # [B, U1, J]
        return (beta_out, g_dec, g_W, g_b), g_enc_c

    init = (
        jnp.full((B, U1), NEG_INF),
        jnp.zeros(dec_p.shape, jnp.float32),  # grad accumulators stay fp32
        jnp.zeros(W.shape, jnp.float32),
        jnp.zeros(bb.shape, jnp.float32),
    )
    (beta0, g_dec, g_W, g_b), g_enc_chunks_rev = jax.lax.scan(
        chunk_bwd, init, jnp.arange(n_chunks - 1, -1, -1)
    )
    g_enc_chunks = jnp.flip(g_enc_chunks_rev, axis=0)  # [n_chunks, B, C, J]
    g_enc = jnp.moveaxis(g_enc_chunks, 0, 1).reshape(B, T_pad, J)[:, :T]
    return (
        g_enc.astype(enc_proj.dtype),
        g_dec.astype(dec_proj.dtype),
        g_W.astype(fc_kernel.dtype),
        g_b.astype(fc_bias.dtype),
        None,
        None,
        None,
    )


rnnt_loss_fused_xla.defvjp(_fused_fwd, _fused_bwd)
