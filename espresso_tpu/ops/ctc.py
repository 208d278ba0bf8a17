"""CTC loss (jittable, static-shape).

Semantics follow the reference criterion espresso/criterions/ctc_loss.py:86-97
(torch.nn.functional.ctc_loss with zero_infinity): summed negative
log-likelihood over the CTC alignment lattice with a configurable blank index.

Implemented as a log-semiring forward pass with ``lax.scan`` over time and the
extended-label dimension fully vectorized — each scan step is a 3-way
logaddexp over shifted copies, so the whole loss compiles into one fused XLA
loop (no per-example Python and no data-dependent shapes).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30


def ctc_loss(
    logits: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    targets: jnp.ndarray,
    target_lengths: jnp.ndarray,
    blank: int = 0,
    zero_infinity: bool = True,
) -> jnp.ndarray:
    """Per-example CTC negative log-likelihood.

    logits: [B, T, V] unnormalized; logit_lengths: [B];
    targets: [B, U] (no blanks); target_lengths: [B].
    Returns [B] losses (sum-reduce at the call site; invalid rows can be
    masked by the caller's weight vector).
    """
    B, T, V = logits.shape
    U = targets.shape[1]
    S = 2 * U + 1  # extended label sequence: blank y1 blank y2 ... blank

    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    # extended labels: even positions blank, odd positions targets
    ext = jnp.full((B, S), blank, dtype=targets.dtype)
    ext = ext.at[:, 1::2].set(targets)
    # lp_ext[b, t, s] = lp[b, t, ext[b, s]]
    lp_ext = jnp.take_along_axis(
        lp, jnp.broadcast_to(ext[:, None, :], (B, T, S)).astype(jnp.int32), axis=-1
    )

    # skip allowed from s-2 when ext[s] != blank and ext[s] != ext[s-2]
    ext_prev2 = jnp.concatenate(
        [jnp.full((B, 2), blank, ext.dtype), ext[:, :-2]], axis=1
    )
    can_skip = (jnp.arange(S)[None, :] % 2 == 1) & (ext != ext_prev2)
    skip_mask = jnp.where(can_skip, 0.0, NEG_INF)

    alpha0 = jnp.full((B, S), NEG_INF)
    alpha0 = alpha0.at[:, 0].set(lp_ext[:, 0, 0])
    alpha0 = alpha0.at[:, 1].set(
        jnp.where(target_lengths > 0, lp_ext[:, 0, 1], NEG_INF)
    )

    def shift1(x):
        return jnp.concatenate([jnp.full((B, 1), NEG_INF), x[:, :-1]], axis=1)

    def shift2(x):
        return jnp.concatenate([jnp.full((B, 2), NEG_INF), x[:, :-2]], axis=1)

    def step(alpha, lp_t):
        stay = alpha
        diag = shift1(alpha)
        skip = shift2(alpha) + skip_mask
        new = jnp.logaddexp(jnp.logaddexp(stay, diag), skip) + lp_t
        return new, alpha

    lp_ext_tfirst = jnp.moveaxis(lp_ext, 1, 0)  # [T, B, S]
    # run steps 1..T-1; collect alpha at each t (we need final per-example t)
    def scan_step(carry, inp):
        t, lp_t = inp
        alpha = carry
        new = step(alpha, lp_t)[0]
        # freeze rows past their length so final read-out is at t = len-1
        active = (t < logit_lengths)[:, None]
        new = jnp.where(active, new, alpha)
        return new, None

    ts = jnp.arange(1, T)
    alpha_final, _ = jax.lax.scan(scan_step, alpha0, (ts, lp_ext_tfirst[1:]))

    last_s = 2 * target_lengths  # index of final blank
    ll_blank = jnp.take_along_axis(alpha_final, last_s[:, None], axis=1)[:, 0]
    ll_label = jnp.take_along_axis(
        alpha_final, jnp.maximum(last_s - 1, 0)[:, None], axis=1
    )[:, 0]
    ll_label = jnp.where(target_lengths > 0, ll_label, NEG_INF)
    loss = -jnp.logaddexp(ll_blank, ll_label)
    if zero_infinity:
        loss = jnp.where(jnp.isfinite(loss) & (loss < -NEG_INF / 2), loss, 0.0)
    return loss


def ctc_output_lengths(src_lengths: jnp.ndarray) -> jnp.ndarray:
    """Identity hook: encoder already reports subsampled lengths
    (reference ctc_loss.py:64-74 derives them from the padding mask)."""
    return src_lengths
