"""Lattice-free fused RNNT loss: joint + forward-backward in one scan.

The transducer's memory cliff is the B×T×(U+1)×V joint lattice
(SURVEY.md §5: the reference can only mitigate by batching on T·U,
asr_dataset.py:369-382). This implementation never materializes it: the
``lax.scan`` over encoder frames computes each frame's joint logits
[B, U+1, V] on the fly from the projected encoder/prediction features,
consumes them into the alpha recurrence, and discards them — peak memory is
O(B·U·V) per frame instead of O(B·T·U·V).

The backward pass (``jax.custom_vjp``) recomputes each frame's joint in a
reverse scan, forms the denominator occupancies from alpha/beta, chains
through the log-softmax and the final vocabulary projection analytically, and
accumulates gradients for (enc_proj, dec_proj, fc_kernel, fc_bias). Gradients
through the upstream projections/LayerNorms/model then flow via normal
autodiff on those inputs.

Inputs:
  enc_proj  [B, T, J]  — ln_enc(proj_enc(encoder_out))   (joint enc side)
  dec_proj  [B, U+1, J] — ln_dec(proj_dec(pred_features)) (joint dec side)
  fc_kernel [J, V], fc_bias [V] — the joint's vocabulary projection
  targets [B, U], src_lengths [B], tgt_lengths [B], blank id

Verified against ops/rnnt.py (the lattice implementation) for values and
gradients.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from espresso_tpu.ops.rnnt import _log_chain_scan

NEG_INF = -1.0e30


def _frame_transitions(enc_t, dec_proj, fc_kernel, fc_bias, tgt, blank):
    """Per-frame joint: returns (lpb [B,U1], lpl [B,U1], residuals)."""
    pre = jax.nn.relu(enc_t[:, None, :] + dec_proj)  # [B, U1, J]
    logits = (
        jnp.einsum("buj,jv->buv", pre, fc_kernel, preferred_element_type=jnp.float32)
        + fc_bias
    )
    lp = jax.nn.log_softmax(logits, axis=-1)
    lpb = lp[..., blank]
    lpl = jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
    U1 = lpl.shape[1]
    u_idx = jnp.arange(U1)[None, :]
    lpl = jnp.where(u_idx < U1 - 1, lpl, NEG_INF)
    return lpb, lpl, (pre, lp)


def _alpha_scan(enc_proj, dec_proj, fc_kernel, fc_bias, tgt, src_lengths, tgt_lengths, blank):
    """Forward over frames; returns (logZ [B], alphas [T, B, U1])."""
    B, T, J = enc_proj.shape
    U1 = dec_proj.shape[1]
    u_idx = jnp.arange(U1)[None, :]
    valid_u = u_idx <= tgt_lengths[:, None]

    lpb0, lpl0, _ = _frame_transitions(
        enc_proj[:, 0], dec_proj, fc_kernel, fc_bias, tgt, blank
    )
    shifted0 = jnp.concatenate([jnp.zeros((B, 1)), lpl0[:, :-1]], axis=1)
    alpha0 = jnp.where(valid_u, jnp.cumsum(shifted0, axis=1), NEG_INF)

    def step(carry, t):
        alpha_prev, lpb_prev = carry
        lpb_t, lpl_t, _ = _frame_transitions(
            enc_proj[:, t], dec_proj, fc_kernel, fc_bias, tgt, blank
        )
        from_blank = alpha_prev + lpb_prev
        c = jnp.concatenate([jnp.full((B, 1), NEG_INF), lpl_t[:, :-1]], axis=1)
        alpha_t = _log_chain_scan(from_blank, c)
        alpha_t = jnp.where(valid_u, alpha_t, NEG_INF)
        active = (t < src_lengths)[:, None]
        alpha_t = jnp.where(active, alpha_t, alpha_prev)
        lpb_keep = jnp.where(active, lpb_t, lpb_prev)
        return (alpha_t, lpb_keep), alpha_prev

    (alpha_last, lpb_last), alphas = jax.lax.scan(
        step, (alpha0, lpb0), jnp.arange(1, T)
    )
    alphas = jnp.concatenate([alphas, alpha_last[None]], axis=0)  # [T, B, U1]
    alpha_end = jnp.take_along_axis(alpha_last, tgt_lengths[:, None], axis=1)[:, 0]
    lpb_end = jnp.take_along_axis(lpb_last, tgt_lengths[:, None], axis=1)[:, 0]
    return alpha_end + lpb_end, alphas


@jax.custom_vjp
def rnnt_loss_fused(
    enc_proj, dec_proj, fc_kernel, fc_bias, targets, src_lengths, tgt_lengths, blank
):
    B = enc_proj.shape[0]
    tgt = jnp.concatenate(
        [targets.astype(jnp.int32), jnp.zeros((B, 1), jnp.int32)], axis=1
    )
    logZ, _ = _alpha_scan(
        enc_proj.astype(jnp.float32),
        dec_proj.astype(jnp.float32),
        fc_kernel.astype(jnp.float32),
        fc_bias.astype(jnp.float32),
        tgt,
        src_lengths,
        tgt_lengths,
        blank,
    )
    return -logZ


def _fused_fwd(enc_proj, dec_proj, fc_kernel, fc_bias, targets, src_lengths, tgt_lengths, blank):
    loss = rnnt_loss_fused(
        enc_proj, dec_proj, fc_kernel, fc_bias, targets, src_lengths, tgt_lengths, blank
    )
    return loss, (
        enc_proj,
        dec_proj,
        fc_kernel,
        fc_bias,
        targets,
        src_lengths,
        tgt_lengths,
        blank,
    )


def _fused_bwd(res, g):
    (
        enc_proj,
        dec_proj,
        fc_kernel,
        fc_bias,
        targets,
        src_lengths,
        tgt_lengths,
        blank,
    ) = res
    enc_proj = enc_proj.astype(jnp.float32)
    dec_proj = dec_proj.astype(jnp.float32)
    fc_kernel32 = fc_kernel.astype(jnp.float32)
    fc_bias32 = fc_bias.astype(jnp.float32)
    B, T, J = enc_proj.shape
    U1 = dec_proj.shape[1]
    V = fc_bias.shape[0]
    tgt = jnp.concatenate(
        [targets.astype(jnp.int32), jnp.zeros((B, 1), jnp.int32)], axis=1
    )
    u_idx = jnp.arange(U1)[None, :]
    valid_u = u_idx <= tgt_lengths[:, None]

    logZ, alphas = _alpha_scan(
        enc_proj, dec_proj, fc_kernel32, fc_bias32, tgt, src_lengths, tgt_lengths, blank
    )

    onehot_tgt = jax.nn.one_hot(tgt, V, dtype=jnp.float32)  # [B, U1, V]
    onehot_blank = jax.nn.one_hot(
        jnp.full((U1,), blank, jnp.int32), V, dtype=jnp.float32
    )  # [U1, V]

    def bwd_step(carry, t):
        beta_next, g_dec, g_W, g_b = carry
        alpha_t = alphas[t]  # [B, U1]
        lpb_t, lpl_t, (pre, lp) = _frame_transitions(
            enc_proj[:, t], dec_proj, fc_kernel32, fc_bias32, tgt, blank
        )
        # beta at t: within-frame label chain + blank to t+1; at t == len-1
        # the closed form (suffix labels + final blank)
        from_blank = lpb_t + beta_next
        a_rev = jnp.flip(from_blank, axis=1)
        c_rev = jnp.flip(lpl_t, axis=1)
        beta_t = jnp.flip(_log_chain_scan(a_rev, c_rev), axis=1)
        beta_t = jnp.where(valid_u, beta_t, NEG_INF)
        lpb_final = jnp.take_along_axis(lpb_t, tgt_lengths[:, None], axis=1)
        masked_label = jnp.where(u_idx < tgt_lengths[:, None], lpl_t, 0.0)
        suffix = jnp.flip(jnp.cumsum(jnp.flip(masked_label, axis=1), axis=1), axis=1)
        beta_last = jnp.where(valid_u, suffix + lpb_final, NEG_INF)
        is_last = (t == src_lengths - 1)[:, None]
        beta_t = jnp.where(is_last, beta_last, beta_t)
        inactive = (t >= src_lengths)[:, None]
        beta_t = jnp.where(inactive, beta_next, beta_t)

        # occupancies at frame t
        is_terminal = is_last & (u_idx == tgt_lengths[:, None])
        beta_after_blank = jnp.where(is_terminal, 0.0, beta_next)
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

        # d(-logZ)/d lp[t] = -(occ scattered); chain log_softmax:
        # g_logits = g_lp - softmax * sum(g_lp)
        g_lp = -(
            occ_blank[..., None] * onehot_blank[None]
            + occ_label[..., None] * onehot_tgt
        ) * g[:, None, None]
        sum_glp = g_lp.sum(axis=-1, keepdims=True)
        g_logits = g_lp - jnp.exp(lp) * sum_glp  # [B, U1, V]

        # chain the vocab projection and relu
        g_b = g_b + g_logits.sum(axis=(0, 1))
        g_W = g_W + jnp.einsum(
            "buj,buv->jv", pre, g_logits, preferred_element_type=jnp.float32
        )
        g_pre = jnp.einsum(
            "buv,jv->buj", g_logits, fc_kernel32,
            preferred_element_type=jnp.float32,
        ) * (pre > 0)
        g_enc_t = g_pre.sum(axis=1)  # [B, J]
        g_dec = g_dec + g_pre
        return (beta_t, g_dec, g_W, g_b), g_enc_t

    init = (
        jnp.full((B, U1), NEG_INF),
        jnp.zeros_like(dec_proj),
        jnp.zeros_like(fc_kernel32),
        jnp.zeros_like(fc_bias32),
    )
    (beta0, g_dec, g_W, g_b), g_enc_rev = jax.lax.scan(
        bwd_step, init, jnp.arange(T - 1, -1, -1)
    )
    g_enc = jnp.flip(g_enc_rev, axis=0)  # [T, B, J]
    g_enc = jnp.moveaxis(g_enc, 0, 1)  # [B, T, J]
    return (
        g_enc.astype(enc_proj.dtype),
        g_dec.astype(dec_proj.dtype),
        g_W.astype(fc_kernel.dtype),
        g_b.astype(fc_bias.dtype),
        None,
        None,
        None,
        None,
    )


rnnt_loss_fused.defvjp(_fused_fwd, _fused_bwd)
