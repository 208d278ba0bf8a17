"""BASE layer MoE: balanced auction assignment (libbase replacement) and the
gated expert-FFN module."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espresso_tpu.modules.base_layer import BaseLayer
from espresso_tpu.ops.assignment import balanced_assignment, greedy_assignment


def _optimal_total(scores, C):
    """Exact optimum via scipy on the expert-replicated assignment problem."""
    scipy = pytest.importorskip("scipy.optimize")
    T, E = scores.shape
    cost = -np.repeat(scores, C, axis=1)  # each expert replicated C times
    r, c = scipy.linear_sum_assignment(cost)
    return -cost[r, c].sum()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_balanced_assignment_capacity_and_quality(seed):
    rng = np.random.default_rng(seed)
    T, E = 32, 4
    scores = rng.standard_normal((T, E)).astype(np.float32)
    assign = np.asarray(jax.jit(balanced_assignment)(jnp.asarray(scores)))
    counts = np.bincount(assign, minlength=E)
    assert (counts == T // E).all(), counts
    total = scores[np.arange(T), assign].sum()
    opt = _optimal_total(scores, T // E)
    # auction with eps=(max-min)/50 is within T*eps of optimal
    eps = max((scores.max() - scores.min()) / 50, 1e-4)
    assert total >= opt - T * eps - 1e-4, (total, opt)


def test_balanced_assignment_beats_greedy_on_contention():
    # all tokens prefer expert 0: balanced must spread them anyway
    scores = np.zeros((8, 2), np.float32)
    scores[:, 0] = np.arange(8)
    assign = np.asarray(balanced_assignment(jnp.asarray(scores)))
    counts = np.bincount(assign, minlength=2)
    assert (counts == 4).all()
    # the 4 highest-affinity tokens should hold expert 0
    assert set(np.nonzero(assign == 0)[0]) == {4, 5, 6, 7}


def test_greedy_assignment_capacity():
    rng = np.random.default_rng(0)
    scores = rng.standard_normal((16, 4)).astype(np.float32)
    assign, kept = jax.jit(lambda s: greedy_assignment(s, 3))(jnp.asarray(scores))
    assign, kept = np.asarray(assign), np.asarray(kept)
    assert (assign == scores.argmax(1)).all()
    for e in range(4):
        assert ((assign == e) & kept).sum() <= 3
    # kept tokens are the highest-affinity claimants of each expert
    for e in range(4):
        claim = np.nonzero(assign == e)[0]
        if len(claim) > 3:
            top = claim[np.argsort(-scores[claim, e])[:3]]
            assert set(np.nonzero((assign == e) & kept)[0]) == set(top)


def _mk(train):
    layer = BaseLayer(embed_dim=16, ffn_dim=32, num_experts=4, shuffle=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32)
    variables = layer.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x,
        train=True,
    )
    return layer, variables, x


def test_base_layer_identity_at_init_eval():
    # ff2 zero-init => expert output == input => mixed == input at init
    layer, variables, x = _mk(train=False)
    y = layer.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_base_layer_train_shapes_and_grad():
    layer, variables, x = _mk(train=True)
    # perturb ff2 away from zero-init: otherwise expert output == input and
    # the gate (hence the centroids) correctly gets zero gradient
    params = dict(variables["params"])
    params["ff2_kernel_0"] = (
        jax.random.normal(jax.random.PRNGKey(9), params["ff2_kernel_0"].shape)
        * 0.1
    )
    variables = {"params": params}

    def loss(params):
        y = layer.apply(
            {"params": params},
            x,
            train=True,
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        return (y.astype(jnp.float32) ** 2).sum()

    g = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(t)).all() for t in flat)
    # centroids receive gradient through the sigmoid gate
    assert float(jnp.abs(g["expert_centroids"]).sum()) > 0
    # expert FFN params receive gradient
    assert float(jnp.abs(g["ff1_kernel_0"]).sum()) > 0


def test_base_layer_train_restores_token_order():
    # with zero-init ff2 the layer is identity even in train mode, so any
    # mis-scatter after shuffle+routing would corrupt the output
    layer, variables, x = _mk(train=True)
    y = layer.apply(
        variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(3)}
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_speech_transformer_with_base_layers():
    """BASE layers wired into the decoder: train forward + incremental
    decode step agree with decode_sequence, and params shard on 'model'."""
    import tests.test_models as tm
    from espresso_tpu.models.speech_transformer import SpeechTransformerModel

    frames, lengths, prev = tm._batch()
    cfg = tm.small_transformer_cfg(base_layers=1, base_experts=2)
    model = SpeechTransformerModel(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        frames,
        lengths,
        prev,
    )
    assert any("base0" in k for k in variables["params"])
    (logits, enc), _ = model.apply(
        variables, frames, lengths, prev, mutable=["batch_stats"]
    )
    assert logits.shape == prev.shape + (tm.V,)
    # train-mode forward (balanced routing + shuffle) is finite
    (tr_logits, _), _ = model.apply(
        variables,
        frames,
        lengths,
        prev,
        train=True,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert np.isfinite(np.asarray(tr_logits)).all()

    # incremental step path runs through the BASE layer too
    enc2 = model.apply(variables, frames, lengths, method=model.encode)
    cache = model.apply(variables, enc2, 8, method=model.init_cache)
    step_logits, _, _ = model.apply(
        variables,
        prev[:, 0],
        jnp.int32(0),
        cache,
        enc2,
        method=model.decode_step,
    )
    seq_logits = model.apply(
        variables, prev[:, :1], enc2, method=model.decode_sequence
    )
    np.testing.assert_allclose(
        np.asarray(step_logits), np.asarray(seq_logits[:, 0]), atol=2e-4
    )


def test_base_layer_expert_sharding_rules():
    from espresso_tpu.parallel.mesh import make_mesh, partition_params

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    mesh = make_mesh(-1, 2)
    params = {
        "declayer0": {"q_proj": {"kernel": np.zeros((16, 16))}},
        "base0": {
            "expert_centroids": np.zeros((2, 16)),
            "ff1_kernel_0": np.zeros((2, 16, 32)),
            "ff2_bias_0": np.zeros((2, 16)),
        },
    }
    sh = partition_params(params, mesh, tensor_parallel=True)
    assert sh["base0"]["expert_centroids"].spec == jax.sharding.PartitionSpec("model", None)
    assert sh["base0"]["ff1_kernel_0"].spec == jax.sharding.PartitionSpec("model")
