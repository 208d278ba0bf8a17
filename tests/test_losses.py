import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espresso_tpu.ops.ctc import ctc_loss
from espresso_tpu.ops.rnnt import rnnt_loss
from espresso_tpu.ops.losses import (
    label_smoothed_cross_entropy,
    cross_entropy_loss,
    unigram_probs_from_counts,
)


def test_ctc_matches_torch():
    import torch
    import torch.nn.functional as tF

    rng = np.random.default_rng(0)
    B, T, V, U = 3, 12, 7, 4
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    tls = np.array([12, 9, 7])
    uls = np.array([4, 3, 2])
    targets = rng.integers(1, V, size=(B, U)).astype(np.int32)
    ours = np.asarray(
        ctc_loss(
            jnp.asarray(logits),
            jnp.asarray(tls),
            jnp.asarray(targets),
            jnp.asarray(uls),
            blank=0,
        )
    )
    tlog = torch.tensor(logits).log_softmax(-1).transpose(0, 1)
    ref = tF.ctc_loss(
        tlog,
        torch.tensor(targets.astype(np.int64)),
        torch.tensor(tls),
        torch.tensor(uls),
        blank=0,
        reduction="none",
        zero_infinity=True,
    ).numpy()
    assert np.allclose(ours, ref, atol=1e-3)


def test_ctc_grad_matches_torch():
    import torch
    import torch.nn.functional as tF

    rng = np.random.default_rng(1)
    B, T, V, U = 2, 8, 5, 3
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    tls = np.array([8, 6])
    uls = np.array([3, 2])
    targets = rng.integers(1, V, size=(B, U)).astype(np.int32)

    g = jax.grad(
        lambda x: ctc_loss(
            x, jnp.asarray(tls), jnp.asarray(targets), jnp.asarray(uls), 0
        ).sum()
    )(jnp.asarray(logits))

    t_in = torch.tensor(logits, requires_grad=True)
    loss = tF.ctc_loss(
        t_in.log_softmax(-1).transpose(0, 1),
        torch.tensor(targets.astype(np.int64)),
        torch.tensor(tls),
        torch.tensor(uls),
        blank=0,
        reduction="sum",
        zero_infinity=True,
    )
    loss.backward()
    assert np.allclose(np.asarray(g), t_in.grad.numpy(), atol=2e-3)


def _brute_rnnt(logp, tgt, T, U, blank):
    alpha = np.full((T, U + 1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(T):
        for u in range(U + 1):
            cands = []
            if t > 0:
                cands.append(alpha[t - 1, u] + logp[t - 1, u, blank])
            if u > 0:
                cands.append(alpha[t, u - 1] + logp[t, u - 1, tgt[u - 1]])
            if cands and not (t == 0 and u == 0):
                alpha[t, u] = np.logaddexp.reduce(cands)
    return -(alpha[T - 1, U] + logp[T - 1, U, blank])


def test_rnnt_matches_bruteforce():
    rng = np.random.default_rng(0)
    B, T, U, V = 2, 6, 3, 5
    logits = rng.standard_normal((B, T, U + 1, V)).astype(np.float32)
    tls = np.array([6, 4])
    uls = np.array([3, 2])
    targets = np.array([[1, 2, 3], [2, 4, 0]], dtype=np.int32)
    ours = np.asarray(
        rnnt_loss(
            jnp.asarray(logits),
            jnp.asarray(targets),
            jnp.asarray(tls),
            jnp.asarray(uls),
            blank=0,
        )
    )
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1), np.float64)
    ref = np.array(
        [_brute_rnnt(logp[b], targets[b], tls[b], uls[b], 0) for b in range(B)]
    )
    assert np.allclose(ours, ref, atol=1e-3)


def test_rnnt_gradcheck_sampled():
    rng = np.random.default_rng(3)
    B, T, U, V = 2, 5, 2, 4
    logits = rng.standard_normal((B, T, U + 1, V)).astype(np.float32)
    tls = np.array([5, 3])
    uls = np.array([2, 1])
    targets = np.array([[1, 2], [3, 0]], dtype=np.int32)
    fs = jax.jit(
        lambda x: rnnt_loss(
            x, jnp.asarray(targets), jnp.asarray(tls), jnp.asarray(uls), 0
        ).sum()
    )
    g = jax.grad(fs)(jnp.asarray(logits))
    eps = 1e-2
    for idx in [(0, 0, 0, 1), (0, 2, 1, 0), (1, 1, 0, 3), (1, 2, 1, 0), (0, 4, 2, 2)]:
        e = np.zeros_like(logits)
        e[idx] = eps
        num = (fs(jnp.asarray(logits + e)) - fs(jnp.asarray(logits - e))) / (2 * eps)
        assert abs(float(g[idx]) - float(num)) < 5e-3


def test_label_smoothing_uniform_matches_manual():
    rng = np.random.default_rng(0)
    B, U, V = 2, 4, 6
    logits = jnp.asarray(rng.standard_normal((B, U, V)).astype(np.float32))
    target = jnp.asarray(rng.integers(1, V, size=(B, U)).astype(np.int32))
    mask = jnp.asarray(np.array([[1, 1, 1, 0], [1, 1, 0, 0]], bool))
    eps = 0.1
    loss, nll = label_smoothed_cross_entropy(logits, target, mask, eps)
    lp = np.asarray(jax.nn.log_softmax(logits, -1))
    tgt = np.asarray(target)
    m = np.asarray(mask)
    nll_ref = sum(
        -lp[b, u, tgt[b, u]] for b in range(B) for u in range(U) if m[b, u]
    )
    smooth_ref = sum(-lp[b, u].sum() for b in range(B) for u in range(U) if m[b, u])
    eps_i = eps / (V - 1)
    loss_ref = (1 - eps - eps_i) * nll_ref + eps_i * smooth_ref
    assert abs(float(loss) - loss_ref) < 1e-3
    assert abs(float(nll) - nll_ref) < 1e-3


def test_label_smoothing_temporal_and_unigram_run():
    rng = np.random.default_rng(0)
    B, U, V = 2, 5, 8
    logits = jnp.asarray(rng.standard_normal((B, U, V)).astype(np.float32))
    target = jnp.asarray(rng.integers(2, V, size=(B, U)).astype(np.int32))
    mask = jnp.ones((B, U), bool)
    l1, _ = label_smoothed_cross_entropy(
        logits, target, mask, 0.1, smoothing_type="temporal", pad_index=0
    )
    uni = jnp.asarray(unigram_probs_from_counts(np.arange(V) + 1.0, 1.0, 0))
    l2, _ = label_smoothed_cross_entropy(
        logits, target, mask, 0.1, smoothing_type="unigram", unigram_probs=uni
    )
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    # eps=0 reduces to plain CE
    l3, nll3 = label_smoothed_cross_entropy(logits, target, mask, 0.0)
    ce, _ = cross_entropy_loss(logits, target, mask)
    assert abs(float(l3) - float(ce)) < 1e-4
