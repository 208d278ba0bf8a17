"""Rotary positional embeddings (fairseq/modules/rotary_positional_embedding.py
equivalent): relative-shift invariance, cache consistency, encoder wiring."""

import jax
import jax.numpy as jnp
import numpy as np

from espresso_tpu.modules.attention import MultiheadAttention
from espresso_tpu.modules.positional import apply_rotary, rotary_inv_freq


def test_rotary_norm_and_shift_invariance():
    rng = np.random.default_rng(0)
    Dh = 32
    q = jnp.asarray(rng.standard_normal((1, 5, 2, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 5, 2, Dh)), jnp.float32)
    inv_freq = rotary_inv_freq(Dh)
    pos = jnp.arange(5)
    q_r = apply_rotary(q, pos, inv_freq)
    # rotation preserves norms
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(q_r), axis=-1),
        np.linalg.norm(np.asarray(q), axis=-1),
        rtol=1e-5,
    )
    # scores depend only on relative offsets: shifting both positions by s
    # leaves q·k unchanged
    k_r = apply_rotary(k, pos, inv_freq)
    scores = jnp.einsum("blhd,bmhd->bhlm", q_r, k_r)
    q_s = apply_rotary(q, pos + 7, inv_freq)
    k_s = apply_rotary(k, pos + 7, inv_freq)
    scores_s = jnp.einsum("blhd,bmhd->bhlm", q_s, k_s)
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(scores_s), atol=1e-4
    )


def test_rotary_attention_incremental_matches_full():
    rng = np.random.default_rng(1)
    B, T, D, H = 2, 6, 16, 2
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    mha = MultiheadAttention(D, H, use_rotary=True)
    variables = mha.init(jax.random.PRNGKey(0), x, x, x)
    causal = jnp.where(
        jnp.arange(T)[None, :] <= jnp.arange(T)[:, None], 0.0, -1e9
    )
    full, _, _ = mha.apply(variables, x, x, x, attn_mask=causal)
    cache = {
        "k": jnp.zeros((B, T, H, D // H)),
        "v": jnp.zeros((B, T, H, D // H)),
    }
    steps = []
    for t in range(T):
        xt = x[:, t : t + 1]
        out, _, cache = mha.apply(
            variables, xt, xt, xt, cache=cache, cache_index=jnp.int32(t)
        )
        steps.append(out)
    inc = jnp.concatenate(steps, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(inc), atol=1e-5)


def test_encoder_rotary_pos_type():
    from espresso_tpu.models.speech_transformer import (
        SpeechTransformerConfig,
        SpeechTransformerEncoder,
    )

    cfg = SpeechTransformerConfig(
        feat_dim=8,
        vocab_size=11,
        encoder_embed_dim=16,
        encoder_ffn_dim=32,
        encoder_layers=2,
        encoder_heads=2,
        encoder_pos_type="rotary",
        encoder_layer_type="conformer",
        conv_norm_type="layer",
        conformer_norm_type="layer",
        dropout=0.0,
    )
    enc = SpeechTransformerEncoder(cfg)
    rng = np.random.default_rng(2)
    frames = jnp.asarray(rng.standard_normal((2, 20, 8)), jnp.float32)
    lengths = jnp.asarray([20, 14])
    out = enc.apply(enc.init(jax.random.PRNGKey(0), frames, lengths), frames, lengths)
    assert out.encoder_out.ndim == 3
    assert np.isfinite(np.asarray(out.encoder_out)).all()
