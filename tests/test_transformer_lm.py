"""Transformer LM + adaptive softmax/input (fairseq transformer_lm.py,
adaptive_softmax.py, adaptive_input.py, adaptive_loss.py equivalents)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espresso_tpu.models.transformer_lm import (
    TransformerLanguageModel,
    TransformerLMConfig,
)
from espresso_tpu.modules.adaptive_softmax import AdaptiveInput, AdaptiveSoftmax

V = 50


def _cfg(**kw):
    base = dict(
        vocab_size=V,
        embed_dim=16,
        ffn_dim=32,
        layers=2,
        heads=2,
        dropout=0.0,
        max_target_positions=64,
    )
    base.update(kw)
    return TransformerLMConfig(**base)


def test_adaptive_softmax_normalizes_and_matches_gather():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, V, 4))
    mod = AdaptiveSoftmax(V, 16, (10, 25))
    variables = mod.init(jax.random.PRNGKey(0), x, targets, method="target_lprobs")
    full = mod.apply(variables, x, method="log_probs")
    assert full.shape == (4, V)
    # proper distribution over the whole vocab
    np.testing.assert_allclose(
        np.asarray(jax.nn.logsumexp(full, axis=-1)), 0.0, atol=1e-4
    )
    tl = mod.apply(variables, x, targets, method="target_lprobs")
    np.testing.assert_allclose(
        np.asarray(tl),
        np.asarray(jnp.take_along_axis(full, targets[:, None], axis=1)[:, 0]),
        atol=1e-5,
    )


def test_adaptive_input_shapes_and_cluster_params():
    tokens = jnp.asarray([[0, 9, 10, 24, 25, V - 1]])
    mod = AdaptiveInput(V, 16, (10, 25))
    variables = mod.init(jax.random.PRNGKey(0), tokens)
    out = mod.apply(variables, tokens)
    assert out.shape == (1, 6, 16)
    # head embeds full dim, clusters shrink by factor
    p = variables["params"]
    assert p["embed0"]["embedding"].shape == (10, 16)
    assert p["embed1"]["embedding"].shape == (15, 4)
    assert p["embed2"]["embedding"].shape == (V - 25, 1)


@pytest.mark.parametrize("adaptive", [False, True])
def test_transformer_lm_incremental_matches_full(adaptive):
    cfg = _cfg(
        adaptive_softmax_cutoff=(10, 25) if adaptive else None,
        adaptive_input=adaptive,
        share_embed=not adaptive,
    )
    lm = TransformerLanguageModel(cfg)
    rng = np.random.default_rng(1)
    B, U = 2, 7
    tokens = jnp.asarray(rng.integers(0, V, (B, U)), jnp.int32)
    variables = lm.init(jax.random.PRNGKey(0), tokens)
    full = lm.apply(variables, tokens)
    assert full.shape == (B, U, V)
    carry = lm.apply(variables, B, U, method="init_carry")
    outs = []
    for t in range(U):
        logit, carry = lm.apply(
            variables, tokens[:, t], carry, method="decode_step"
        )
        outs.append(logit)
    inc = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(inc), atol=2e-4)


def test_adaptive_loss_matches_dense_ce():
    import espresso_tpu.criterions  # noqa: F401 (registration)
    from espresso_tpu.config import EspressoConfig
    from espresso_tpu.registry import CRITERIONS

    cfg = _cfg(adaptive_softmax_cutoff=(10, 25), share_embed=False)
    lm = TransformerLanguageModel(cfg)
    rng = np.random.default_rng(2)
    B, U = 3, 5
    prev = jnp.asarray(rng.integers(2, V, (B, U)), jnp.int32)
    target = jnp.asarray(rng.integers(2, V, (B, U)), jnp.int32)
    variables = lm.init(jax.random.PRNGKey(0), prev)
    batch = {
        "prev_output_tokens": prev,
        "target": target,
        "weight": jnp.ones((B,)),
    }

    class _Dict:
        def pad(self):
            return 1

        count = [1] * V

    class _Task:
        dictionary = _Dict()

    crit = CRITERIONS.build(
        "adaptive_loss", EspressoConfig().criterion, _Task()
    )
    loss, n, logging, _ = crit(lm, variables, batch)
    # dense reference: full log-prob table gather
    full = lm.apply(variables, prev)  # already log-probs (adaptive head)
    lp = jax.nn.log_softmax(full.astype(jnp.float32), -1)
    ref = -jnp.take_along_axis(lp, target[..., None], -1)[..., 0]
    ref = jnp.where(target != 1, ref, 0.0).sum()
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-4)


def test_transformer_lm_fusion_adapter():
    from espresso_tpu.decode.api import make_adapter

    cfg = _cfg()
    lm = TransformerLanguageModel(cfg)
    tokens = jnp.zeros((2, 3), jnp.int32)
    variables = lm.init(jax.random.PRNGKey(0), tokens)
    ad = make_adapter(lm)
    state = ad.init_state(variables, None, 4, 16)
    logits, state, _ = ad.step(variables, jnp.zeros((4,), jnp.int32), state)
    assert logits.shape == (4, V)
    state = ad.reorder(state, jnp.asarray([1, 0, 3, 2]))
    logits2, state, _ = ad.step(variables, jnp.ones((4,), jnp.int32), state)
    assert np.isfinite(np.asarray(logits2)).all()


def test_per_row_positions_match_full_forward_uneven():
    """The per-row incremental path (transducer-AES fusion mechanism): rows
    advanced different numbers of steps must each match a full causal
    forward over that row's own prefix."""
    cfg = _cfg()
    lm = TransformerLanguageModel(cfg)
    rng = np.random.default_rng(7)
    B, U = 3, 6
    tokens = jnp.asarray(rng.integers(0, V, (B, U)), jnp.int32)
    variables = lm.init(jax.random.PRNGKey(0), tokens)
    full = lm.apply(variables, tokens)  # [B, U, V]

    # advance row 0 six steps, row 1 three, row 2 one — interleaved so the
    # per-row position counters genuinely diverge
    steps_per_row = [6, 3, 1]
    carry = lm.apply(variables, B, U, method="init_carry")
    got = {b: [] for b in range(B)}
    counters = [0, 0, 0]
    for round_i in range(max(steps_per_row)):
        # rows that still advance feed their next token; exhausted rows
        # re-feed token 0 but their outputs are ignored
        feed = jnp.asarray(
            [
                tokens[b, min(counters[b], U - 1)]
                for b in range(B)
            ],
            jnp.int32,
        )
        logits, new_carry = lm.apply(
            variables, feed, carry, method="decode_step"
        )
        caches, idx = new_carry
        old_caches, old_idx = carry
        # freeze exhausted rows (the AES live-mask pattern)
        live = jnp.asarray(
            [counters[b] < steps_per_row[b] for b in range(B)]
        )
        carry = (
            jax.tree_util.tree_map(
                lambda n, o: jnp.where(
                    live.reshape((B,) + (1,) * (n.ndim - 1)), n, o
                ),
                caches,
                old_caches,
            ),
            jnp.where(live, idx, old_idx),
        )
        for b in range(B):
            if counters[b] < steps_per_row[b]:
                got[b].append(np.asarray(logits[b]))
                counters[b] += 1
    for b in range(B):
        inc = np.stack(got[b])  # [steps_b, V]
        ref = np.asarray(full[b, : steps_per_row[b]])
        np.testing.assert_allclose(inc, ref, atol=3e-4)
