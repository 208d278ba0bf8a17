"""Parity tests for the dual relative-shift paths in MultiheadAttention.

The module picks between two equivalent implementations of the espnet
rel-pos score term bd[b,h,q,k] = q_v[b,q,h,:] . p[k-q+L-1,h,:]
(reference: fairseq/modules/espnet_multihead_attention.py rel_shift):

  - inference: row-gather of the projected table + direct contraction
    (``_rel_bd`` with a scatter-free custom_vjp);
  - training: the Transformer-XL pad/reshape/slice skew.

These tests pin (a) both forms to a brute-force loop oracle, (b) the
custom_vjp backward to autodiff of the oracle, and (c) module-level
equality of deterministic vs non-deterministic applies at dropout=0,
square and non-square.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espresso_tpu.modules.attention import (
    MultiheadAttention,
    _gather_p_shift,
    _rel_bd,
)


def _naive_bd(q_v, p, Tk=None):
    """Loop oracle: bd[b,h,q,k] = q_v[b,q,h] . p[clip(k-q+L-1)]."""
    B, Tq, H, d = q_v.shape
    Tk = Tq if Tk is None else Tk
    L = (p.shape[0] + 1) // 2
    bd = np.zeros((B, H, Tq, Tk), dtype=np.float64)
    for qi in range(Tq):
        for kj in range(Tk):
            o = int(np.clip(kj - qi + L - 1, 0, p.shape[0] - 1))
            bd[:, :, qi, kj] = np.einsum(
                "bhd,hd->bh", np.asarray(q_v[:, qi], np.float64),
                np.asarray(p[o], np.float64))
    return bd


@pytest.mark.parametrize("T,H,d", [(7, 2, 4), (12, 3, 8)])
def test_rel_bd_forward_matches_oracle(T, H, d):
    rng = np.random.RandomState(0)
    q_v = jnp.asarray(rng.randn(3, T, H, d), jnp.float32)
    p = jnp.asarray(rng.randn(2 * T - 1, H, d), jnp.float32)
    got = np.asarray(_rel_bd(q_v, p))
    np.testing.assert_allclose(got, _naive_bd(q_v, p), rtol=1e-5, atol=1e-5)


def test_rel_bd_grads_match_autodiff():
    """custom_vjp (gather fwd, skew-style bwd) vs autodiff of a plain
    gather implementation with no custom rule."""
    rng = np.random.RandomState(1)
    T, H, d = 9, 2, 4
    q_v = jnp.asarray(rng.randn(2, T, H, d), jnp.float32)
    p = jnp.asarray(rng.randn(2 * T - 1, H, d), jnp.float32)
    w = jnp.asarray(rng.randn(2, H, T, T), jnp.float32)  # cotangent mixer

    def loss_custom(q_v, p):
        return jnp.sum(_rel_bd(q_v, p) * w)

    def loss_plain(q_v, p):
        ps = _gather_p_shift(p, T, T)
        return jnp.sum(jnp.einsum("bqhd,qkhd->bhqk", q_v, ps) * w)

    g_c = jax.grad(loss_custom, argnums=(0, 1))(q_v, p)
    g_p = jax.grad(loss_plain, argnums=(0, 1))(q_v, p)
    for a, b in zip(g_c, g_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_gather_p_shift_nonsquare_matches_oracle():
    rng = np.random.RandomState(2)
    Tq, Tk, H, d = 5, 11, 2, 4
    L = 8
    q_v = jnp.asarray(rng.randn(2, Tq, H, d), jnp.float32)
    p = jnp.asarray(rng.randn(2 * L - 1, H, d), jnp.float32)
    got = np.asarray(
        jnp.einsum("bqhd,qkhd->bhqk", q_v, _gather_p_shift(p, Tq, Tk)))
    np.testing.assert_allclose(got, _naive_bd(q_v, p, Tk),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("Tq,Tk", [(10, 10), (6, 13)])
def test_module_train_eval_paths_agree(Tq, Tk):
    """deterministic=True (gather) and =False (skew / take_along_axis)
    must produce identical outputs at dropout=0."""
    rng = np.random.RandomState(3)
    D, Hh = 16, 4
    mha = MultiheadAttention(embed_dim=D, num_heads=Hh, dropout=0.0,
                             use_relative_pos=True)
    q = jnp.asarray(rng.randn(2, Tq, D), jnp.float32)
    kv = q if Tq == Tk else jnp.asarray(rng.randn(2, Tk, D), jnp.float32)
    L = max(Tq, Tk)
    rel = jnp.asarray(rng.randn(2 * L - 1, D), jnp.float32)
    variables = mha.init(jax.random.PRNGKey(0), q, kv, kv, rel_pos=rel)
    # non-zero biases so the ac/bd split is actually exercised
    variables = jax.tree_util.tree_map(
        lambda x: x + 0.01 if x.ndim == 2 and x.shape[-1] == D // Hh else x,
        variables)
    out_eval, _, _ = mha.apply(variables, q, kv, kv, rel_pos=rel,
                               deterministic=True)
    out_train, _, _ = mha.apply(variables, q, kv, kv, rel_pos=rel,
                                deterministic=False,
                                rngs={"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_allclose(np.asarray(out_eval), np.asarray(out_train),
                               rtol=2e-5, atol=2e-5)
