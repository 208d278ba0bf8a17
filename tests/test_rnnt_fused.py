"""Fused (lattice-free) RNNT loss vs the lattice reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espresso_tpu.ops.rnnt import rnnt_loss
from espresso_tpu.ops.rnnt_fused import rnnt_loss_fused


def _setup(B=2, T=6, U=3, J=5, V=7, seed=0):
    rng = np.random.default_rng(seed)
    enc_proj = jnp.asarray(rng.standard_normal((B, T, J)).astype(np.float32))
    dec_proj = jnp.asarray(rng.standard_normal((B, U + 1, J)).astype(np.float32))
    fc_kernel = jnp.asarray(rng.standard_normal((J, V)).astype(np.float32) * 0.5)
    fc_bias = jnp.asarray(rng.standard_normal((V,)).astype(np.float32) * 0.1)
    targets = jnp.asarray(rng.integers(1, V, (B, U)).astype(np.int32))
    src_lengths = jnp.asarray([T, T - 2])
    tgt_lengths = jnp.asarray([U, U - 1])
    return enc_proj, dec_proj, fc_kernel, fc_bias, targets, src_lengths, tgt_lengths


def _lattice_logits(enc_proj, dec_proj, fc_kernel, fc_bias):
    pre = jax.nn.relu(enc_proj[:, :, None, :] + dec_proj[:, None, :, :])
    return jnp.einsum("btuj,jv->btuv", pre, fc_kernel) + fc_bias


def test_fused_matches_lattice_values():
    enc_proj, dec_proj, W, b, targets, sl, tl = _setup()
    fused = np.asarray(
        rnnt_loss_fused(enc_proj, dec_proj, W, b, targets, sl, tl, 0)
    )
    lattice = np.asarray(
        rnnt_loss(_lattice_logits(enc_proj, dec_proj, W, b), targets, sl, tl, 0)
    )
    assert np.allclose(fused, lattice, atol=1e-4), (fused, lattice)


def test_fused_matches_lattice_gradients():
    enc_proj, dec_proj, W, b, targets, sl, tl = _setup(seed=3)

    def loss_fused(e, d, w, bb):
        return rnnt_loss_fused(e, d, w, bb, targets, sl, tl, 0).sum()

    def loss_lattice(e, d, w, bb):
        return rnnt_loss(_lattice_logits(e, d, w, bb), targets, sl, tl, 0).sum()

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(enc_proj, dec_proj, W, b)
    gl = jax.grad(loss_lattice, argnums=(0, 1, 2, 3))(enc_proj, dec_proj, W, b)
    names = ("enc_proj", "dec_proj", "fc_kernel", "fc_bias")
    for name, a, c in zip(names, gf, gl):
        err = np.abs(np.asarray(a) - np.asarray(c)).max()
        assert err < 2e-4, (name, err)


def test_fused_memory_shape_independence():
    # large-ish T with small per-step memory: just verify it runs jitted
    enc_proj, dec_proj, W, b, targets, sl, tl = _setup(B=2, T=64, U=8, J=8, V=16)
    f = jax.jit(
        lambda e, d: rnnt_loss_fused(e, d, W, b, targets, sl, tl, 0).sum()
    )
    v = float(f(enc_proj, dec_proj))
    assert np.isfinite(v)


def test_fused_bf16_inputs_close_to_f32():
    """Mixed precision: bf16 joint-matmul inputs (the trainer's compute
    dtype) must give loss values and upstream gradients close to the f32
    path — DP recursions and grad accumulators stay f32 inside."""
    enc_proj, dec_proj, W, b, targets, sl, tl = _setup(T=12, U=5, seed=9)

    def loss(e, d, w, bb):
        return rnnt_loss_fused(e, d, w, bb, targets, sl, tl, 0).sum()

    v32, g32 = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
        enc_proj, dec_proj, W, b
    )
    v16, g16 = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
        enc_proj.astype(jnp.bfloat16),
        dec_proj.astype(jnp.bfloat16),
        W.astype(jnp.bfloat16),
        b.astype(jnp.bfloat16),
    )
    # loss: relative error bounded by bf16 logit noise
    assert abs(float(v16) - float(v32)) / abs(float(v32)) < 0.05
    for a, c in zip(g32, g16):
        a, c = np.asarray(a, np.float32), np.asarray(c, np.float32)
        denom = np.abs(a).max() + 1e-6
        assert np.abs(a - c).max() / denom < 0.1, np.abs(a - c).max() / denom


def test_pallas_interpret_matches_xla_values_and_grads():
    """The Pallas joint-kernel path (interpret mode on CPU) matches the XLA
    chunked path for values and all four gradients, including padded rows
    (V/J 128-aligned as the kernel's shape gate requires)."""
    from espresso_tpu.ops.rnnt_fused import rnnt_loss_fused_xla
    from espresso_tpu.ops.rnnt_pallas import rnnt_loss_fused_pallas

    enc_proj, dec_proj, W, b, targets, sl, tl = _setup(
        B=2, T=5, U=3, J=128, V=256, seed=7
    )

    def loss_pallas(e, d, w, bb):
        return rnnt_loss_fused_pallas(
            e, d, w, bb, targets, sl, tl, 0, True
        ).sum()

    def loss_xla(e, d, w, bb):
        return rnnt_loss_fused_xla(e, d, w, bb, targets, sl, tl, 0).sum()

    vp = np.asarray(loss_pallas(enc_proj, dec_proj, W, b))
    vx = np.asarray(loss_xla(enc_proj, dec_proj, W, b))
    assert np.allclose(vp, vx, rtol=1e-5, atol=1e-4), (vp, vx)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(enc_proj, dec_proj, W, b)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(enc_proj, dec_proj, W, b)
    for name, a, c in zip(("enc", "dec", "W", "b"), gp, gx):
        err = np.abs(np.asarray(a) - np.asarray(c)).max()
        scale = np.abs(np.asarray(c)).max() + 1e-6
        assert err / scale < 2e-4, (name, err, scale)


def test_pallas_interpret_blank_nonzero_and_uneven_lengths():
    """blank in a non-first V tile + strongly uneven lengths."""
    from espresso_tpu.ops.rnnt_fused import rnnt_loss_fused_xla
    from espresso_tpu.ops.rnnt_pallas import rnnt_loss_fused_pallas

    rng = np.random.default_rng(11)
    B, T, U, J, V = 3, 4, 5, 128, 256
    enc_proj = jnp.asarray(rng.standard_normal((B, T, J)).astype(np.float32))
    dec_proj = jnp.asarray(
        rng.standard_normal((B, U + 1, J)).astype(np.float32)
    )
    W = jnp.asarray(rng.standard_normal((J, V)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.standard_normal((V,)).astype(np.float32) * 0.1)
    targets = jnp.asarray(rng.integers(0, V, (B, U)).astype(np.int32))
    sl = jnp.asarray([T, 1, 2])
    tl = jnp.asarray([U, 0, 2])
    blank = 131  # second V tile

    vp = np.asarray(
        rnnt_loss_fused_pallas(
            enc_proj, dec_proj, W, b, targets, sl, tl, blank, True
        )
    )
    vx = np.asarray(
        rnnt_loss_fused_xla(
            enc_proj, dec_proj, W, b, targets, sl, tl, blank
        )
    )
    assert np.allclose(vp, vx, rtol=1e-5, atol=1e-4), (vp, vx)
