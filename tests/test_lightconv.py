"""Lightweight/dynamic convolutions vs a naive numpy reference."""

import jax
import jax.numpy as jnp
import numpy as np

from espresso_tpu.modules.lightconv import (
    DynamicConv1d,
    LightweightConv1d,
    _unfold,
)


def _naive_lightconv(x, w, padding_l):
    """x [B,T,C], w [H,K]: out[b,t,c] = sum_k w[h(c),k] * x[b, t-pl+k, c]."""
    B, T, C = x.shape
    H, K = w.shape
    R = C // H
    out = np.zeros_like(x)
    for b in range(B):
        for t in range(T):
            for c in range(C):
                h = c // R
                for k in range(K):
                    s = t - padding_l + k
                    if 0 <= s < T:
                        out[b, t, c] += w[h, k] * x[b, s, c]
    return out


def test_unfold_matches_definition():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 3)).astype(np.float32)
    u = np.asarray(_unfold(jnp.asarray(x), 3, 2))  # causal K=3
    for t in range(5):
        for k in range(3):
            s = t - 2 + k
            expect = x[:, s] if 0 <= s < 5 else 0.0
            np.testing.assert_allclose(u[:, t, k], expect)


def test_lightweight_conv_matches_naive():
    rng = np.random.default_rng(1)
    B, T, C, H, K = 2, 7, 8, 4, 3
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    for pad_l in (K - 1, K // 2):
        m = LightweightConv1d(
            input_size=C, kernel_size=K, padding_l=pad_l, num_heads=H,
            weight_softmax=True,
        )
        variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y = np.asarray(m.apply(variables, jnp.asarray(x)))
        w = np.asarray(jax.nn.softmax(variables["params"]["weight"], -1))
        np.testing.assert_allclose(
            y, _naive_lightconv(x, w, pad_l), atol=1e-5
        )


def test_lightweight_conv_causality():
    rng = np.random.default_rng(2)
    B, T, C, H, K = 1, 6, 4, 2, 4
    m = LightweightConv1d(
        input_size=C, kernel_size=K, padding_l=K - 1, num_heads=H
    )
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y0 = np.asarray(m.apply(variables, jnp.asarray(x)))
    x2 = x.copy()
    x2[:, 3:] += 100.0  # future change must not affect t<3
    y1 = np.asarray(m.apply(variables, jnp.asarray(x2)))
    np.testing.assert_allclose(y0[:, :3], y1[:, :3], atol=1e-5)
    assert np.abs(y0[:, 3:] - y1[:, 3:]).max() > 1.0


def test_dynamic_conv_matches_naive_per_position():
    rng = np.random.default_rng(3)
    B, T, C, H, K = 2, 5, 6, 3, 3
    pad_l = K - 1
    m = DynamicConv1d(
        input_size=C, kernel_size=K, padding_l=pad_l, num_heads=H,
        weight_softmax=True,
    )
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(m.apply(variables, jnp.asarray(x)))
    # recompute by hand
    Wl = np.asarray(variables["params"]["weight_linear"]["kernel"])
    bl = np.asarray(variables["params"]["weight_linear"]["bias"])
    w = (x @ Wl + bl).reshape(B, T, H, K)
    w = np.exp(w - w.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    R = C // H
    expect = np.zeros_like(x)
    for b in range(B):
        for t in range(T):
            for c in range(C):
                h = c // R
                for k in range(K):
                    s = t - pad_l + k
                    if 0 <= s < T:
                        expect[b, t, c] += w[b, t, h, k] * x[b, s, c]
    np.testing.assert_allclose(y, expect, atol=1e-5)


def test_dynamic_conv_grad_finite():
    m = DynamicConv1d(input_size=8, kernel_size=3, padding_l=2, num_heads=2,
                      weight_softmax=True, weight_dropout=0.1)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((2, 6, 8)),
                    jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)

    def loss(p):
        y = m.apply({"params": p}, x, train=True,
                    rngs={"dropout": jax.random.PRNGKey(1)})
        return (y ** 2).sum()

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(t)).all()
               for t in jax.tree_util.tree_leaves(g))
