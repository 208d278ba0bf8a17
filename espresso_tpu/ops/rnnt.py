"""RNN-Transducer loss — log-domain forward-backward with analytic gradient.

Matches the semantics of the reference criterion
espresso/criterions/transducer_loss.py:131-140 (torchaudio.functional.rnnt_loss
on the full B×T×(U+1)×V joint lattice, configurable blank, per-example NLL).

TPU-native design:
  * forward alpha and backward beta are ``lax.scan`` loops over T whose inner
    U-recurrence (the label-chain prefix) is a log-semiring *associative scan*
    — O(T·logU) depth, fully vectorized over batch and U, no host loops;
  * the gradient is analytic (occupancy probabilities from alpha+beta) via
    ``jax.custom_vjp``, so autodiff never unrolls the scan — the backward pass
    costs one more scan instead of T stored residual frames;
  * only the gathered blank/label log-probs [B, T, U+1] live in the loop; the
    [B, T, U+1, V] lattice is touched once on entry (gather) and once in the
    VJP (scatter). A Pallas kernel fusing the joint projection into the loss
    (never materializing the lattice) is the follow-up optimization.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30


def _log_chain_scan(a: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Solve x[u] = logaddexp(a[u], x[u-1] + c[u]) along the last axis.

    First-order linear recurrence in the log semiring, evaluated with
    ``lax.associative_scan`` (composition: (c1,a1)∘(c2,a2) =
    (c1+c2, logaddexp(a1+c2, a2))).
    """

    def combine(left, right):
        c1, a1 = left
        c2, a2 = right
        return c1 + c2, jnp.logaddexp(a1 + c2, a2)

    _, x = jax.lax.associative_scan(combine, (c, a), axis=-1)
    return x


def _gather_transitions(
    log_probs: jnp.ndarray, targets: jnp.ndarray, blank: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (lp_blank [B,T,U1], lp_label [B,T,U1]); label col U is -inf."""
    B, T, U1, V = log_probs.shape
    lp_blank = log_probs[..., blank]
    tgt = jnp.concatenate(
        [targets.astype(jnp.int32), jnp.zeros((B, 1), jnp.int32)], axis=1
    )  # [B, U1]
    lp_label = jnp.take_along_axis(
        log_probs, jnp.broadcast_to(tgt[:, None, :, None], (B, T, U1, 1)), axis=-1
    )[..., 0]
    u_idx = jnp.arange(U1)[None, None, :]
    lp_label = jnp.where(u_idx < U1 - 1, lp_label, NEG_INF)
    return lp_blank, lp_label


def _forward_alpha(
    lp_blank: jnp.ndarray,
    lp_label: jnp.ndarray,
    src_lengths: jnp.ndarray,
    tgt_lengths: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """alpha [B,T,U1] and per-example log-likelihood [B]."""
    B, T, U1 = lp_blank.shape
    u_idx = jnp.arange(U1)[None, :]
    valid_u = u_idx <= tgt_lengths[:, None]  # [B, U1]

    # t = 0: label-chain from the origin
    shifted_label0 = jnp.concatenate(
        [jnp.zeros((B, 1)), lp_label[:, 0, :-1]], axis=1
    )
    alpha0 = jnp.cumsum(shifted_label0, axis=1)
    alpha0 = jnp.where(valid_u, alpha0, NEG_INF)

    def step(alpha_prev, inputs):
        t, lpb_prev, lpl_t = inputs
        # blank move from frame t-1 into frame t (same u)
        from_blank = alpha_prev + lpb_prev
        # then label chain within frame t: x[u] = logaddexp(from_blank[u],
        #   x[u-1] + lp_label[t, u-1])
        c = jnp.concatenate([jnp.full((B, 1), NEG_INF), lpl_t[:, :-1]], axis=1)
        alpha_t = _log_chain_scan(from_blank, c)
        alpha_t = jnp.where(valid_u, alpha_t, NEG_INF)
        active = (t < src_lengths)[:, None]
        alpha_t = jnp.where(active, alpha_t, alpha_prev)
        return alpha_t, alpha_prev

    ts = jnp.arange(1, T)
    lpb_tfirst = jnp.moveaxis(lp_blank, 1, 0)
    lpl_tfirst = jnp.moveaxis(lp_label, 1, 0)
    alpha_last, alphas = jax.lax.scan(
        step, alpha0, (ts, lpb_tfirst[:-1], lpl_tfirst[1:])
    )
    alphas = jnp.concatenate([alphas, alpha_last[None]], axis=0)  # [T, B, U1]
    alphas = jnp.moveaxis(alphas, 0, 1)  # [B, T, U1]

    # log Z = alpha[T_b-1, U_b] + lp_blank[T_b-1, U_b]
    t_last = jnp.maximum(src_lengths - 1, 0)
    alpha_end = jnp.take_along_axis(
        alphas, t_last[:, None, None].repeat(U1, -1), axis=1
    )[:, 0]  # [B, U1]
    alpha_end = jnp.take_along_axis(alpha_end, tgt_lengths[:, None], axis=1)[:, 0]
    lpb_end = jnp.take_along_axis(
        lp_blank, t_last[:, None, None].repeat(U1, -1), axis=1
    )[:, 0]
    lpb_end = jnp.take_along_axis(lpb_end, tgt_lengths[:, None], axis=1)[:, 0]
    logZ = alpha_end + lpb_end
    return alphas, logZ


def _backward_beta(
    lp_blank: jnp.ndarray,
    lp_label: jnp.ndarray,
    src_lengths: jnp.ndarray,
    tgt_lengths: jnp.ndarray,
) -> jnp.ndarray:
    """beta [B,T,U1]: log-prob of completing from (t, u)."""
    B, T, U1 = lp_blank.shape
    u_idx = jnp.arange(U1)[None, :]
    valid_u = u_idx <= tgt_lengths[:, None]
    is_final_u = u_idx == tgt_lengths[:, None]

    # beta at the last active frame: chain of labels then final blank.
    # beta[T-1, u] = sum_{i>=u} lp_label[T-1, i] + lp_blank[T-1, U]
    def beta_at_last_frame(lpb_t, lpl_t):
        lpb_final = jnp.take_along_axis(lpb_t, tgt_lengths[:, None], axis=1)
        masked_label = jnp.where(u_idx < tgt_lengths[:, None], lpl_t, 0.0)
        # suffix[u] = sum_{i>=u, i<U_b} lp_label[T_b-1, i]
        suffix = jnp.flip(jnp.cumsum(jnp.flip(masked_label, axis=1), axis=1), axis=1)
        beta = suffix + lpb_final
        return jnp.where(valid_u, beta, NEG_INF)

    def step(beta_next, inputs):
        t, lpb_t, lpl_t = inputs
        # within-frame label chain (right-to-left) + blank move to t+1
        from_blank = lpb_t + beta_next
        # x[u] = logaddexp(from_blank[u], x[u+1] + lp_label[t, u]); reversing
        # u -> r = U-u aligns c_rev[r] with lp_label[t, u] directly
        a_rev = jnp.flip(from_blank, axis=1)
        c_rev = jnp.flip(lpl_t, axis=1)
        beta_t = jnp.flip(_log_chain_scan(a_rev, c_rev), axis=1)
        beta_t = jnp.where(valid_u, beta_t, NEG_INF)
        # rows where t is the LAST active frame get the closed-form init
        is_last = (t == src_lengths - 1)[:, None]
        beta_last = beta_at_last_frame(lpb_t, lpl_t)
        beta_t = jnp.where(is_last, beta_last, beta_t)
        # frozen (t >= len): carry next
        inactive = (t >= src_lengths)[:, None]
        beta_t = jnp.where(inactive, beta_next, beta_t)
        return beta_t, beta_t

    ts = jnp.arange(T - 1, -1, -1)
    lpb_tfirst = jnp.moveaxis(lp_blank, 1, 0)
    lpl_tfirst = jnp.moveaxis(lp_label, 1, 0)
    init = jnp.full((B, U1), NEG_INF)
    _, betas_rev = jax.lax.scan(
        step,
        init,
        (ts, jnp.flip(lpb_tfirst, 0), jnp.flip(lpl_tfirst, 0)),
    )
    betas = jnp.flip(betas_rev, axis=0)  # [T, B, U1]
    return jnp.moveaxis(betas, 0, 1)


@jax.custom_vjp
def rnnt_loss_from_log_probs(
    log_probs: jnp.ndarray,
    targets: jnp.ndarray,
    src_lengths: jnp.ndarray,
    tgt_lengths: jnp.ndarray,
    blank: int,
) -> jnp.ndarray:
    lp_blank, lp_label = _gather_transitions(log_probs, targets, blank)
    _, logZ = _forward_alpha(lp_blank, lp_label, src_lengths, tgt_lengths)
    return -logZ


def _rnnt_fwd(log_probs, targets, src_lengths, tgt_lengths, blank):
    loss = rnnt_loss_from_log_probs(
        log_probs, targets, src_lengths, tgt_lengths, blank
    )
    return loss, (log_probs, targets, src_lengths, tgt_lengths, blank)


def _rnnt_bwd(residuals, g):
    log_probs, targets, src_lengths, tgt_lengths, blank = residuals
    B, T, U1, V = log_probs.shape
    lp_blank, lp_label = _gather_transitions(log_probs, targets, blank)
    alphas, logZ = _forward_alpha(lp_blank, lp_label, src_lengths, tgt_lengths)
    betas = _backward_beta(lp_blank, lp_label, src_lengths, tgt_lengths)

    t_idx = jnp.arange(T)[None, :, None]
    u_idx = jnp.arange(U1)[None, None, :]
    # occupancy of blank transition (t,u) -> (t+1,u); at t = len-1, u = U it
    # closes the lattice (beta_next := 0 there)
    beta_next_t = jnp.concatenate(
        [betas[:, 1:], jnp.full((B, 1, U1), NEG_INF)], axis=1
    )
    is_terminal = (t_idx == (src_lengths - 1)[:, None, None]) & (
        u_idx == tgt_lengths[:, None, None]
    )
    beta_after_blank = jnp.where(is_terminal, 0.0, beta_next_t)
    occ_blank = jnp.exp(
        alphas + lp_blank + beta_after_blank - logZ[:, None, None]
    )
    # occupancy of label transition (t,u) -> (t,u+1)
    beta_right = jnp.concatenate(
        [betas[:, :, 1:], jnp.full((B, T, 1), NEG_INF)], axis=2
    )
    occ_label = jnp.exp(alphas + lp_label + beta_right - logZ[:, None, None])

    valid = (t_idx < src_lengths[:, None, None]) & (
        u_idx <= tgt_lengths[:, None, None]
    )
    occ_blank = jnp.where(valid, occ_blank, 0.0)
    occ_label = jnp.where(valid & (u_idx < tgt_lengths[:, None, None]), occ_label, 0.0)

    # d(-logZ)/d lp = -occupancy; scatter into the lattice
    g3 = g[:, None, None]
    grad = jnp.zeros_like(log_probs)
    grad = grad.at[..., blank].add(-occ_blank * g3)
    tgt = jnp.concatenate(
        [targets.astype(jnp.int32), jnp.zeros((B, 1), jnp.int32)], axis=1
    )
    onehot = jax.nn.one_hot(tgt, V, dtype=log_probs.dtype)  # [B, U1, V]
    grad = grad + (-occ_label * g3)[..., None] * onehot[:, None, :, :]
    return grad, None, None, None, None


rnnt_loss_from_log_probs.defvjp(_rnnt_fwd, _rnnt_bwd)


def rnnt_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    src_lengths: jnp.ndarray,
    tgt_lengths: jnp.ndarray,
    blank: int = 0,
) -> jnp.ndarray:
    """Per-example transducer NLL from the joint lattice.

    logits: [B, T, U+1, V] (U = max target length); targets: [B, U];
    src_lengths/tgt_lengths: [B]. Returns [B] losses.
    """
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return rnnt_loss_from_log_probs(
        log_probs, targets, src_lengths, tgt_lengths, blank
    )
