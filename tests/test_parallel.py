"""Mesh-parallel training tests on 8 virtual CPU devices (the JAX analogue of
the reference's localhost multi-rank tests, tests/distributed/utils.py)."""

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espresso_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    partition_params,
    replicated,
)


def _graft():
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_mesh_construction():
    mesh = make_mesh(4, 2)
    assert dict(mesh.shape) == {"data": 4, "model": 2, "stage": 1}
    mesh = make_mesh(-1, 2)
    assert mesh.shape["data"] == len(jax.devices()) // 2


def test_fsdp_partitioning_rules():
    mesh = make_mesh(8, 1)
    params = {
        "big": jnp.zeros((256, 64)),
        "small": jnp.zeros((4,)),
        "odd": jnp.zeros((13, 7)),
    }
    sh = partition_params(params, mesh, fsdp=True)
    assert sh["big"].spec == jax.sharding.PartitionSpec("data", None)
    assert sh["small"].spec == jax.sharding.PartitionSpec()
    assert sh["odd"].spec == jax.sharding.PartitionSpec()


def test_tp_partitioning_rules():
    mesh = make_mesh(4, 2)
    params = {
        "layer0": {"self_attn": {"q_proj": {"kernel": jnp.zeros((64, 64))}}},
        "layer1": {"self_attn": {"out_proj": {"kernel": jnp.zeros((64, 64))}}},
    }
    sh = partition_params(params, mesh, tensor_parallel=True)
    assert sh["layer0"]["self_attn"]["q_proj"]["kernel"].spec == (
        jax.sharding.PartitionSpec(None, "model")
    )
    assert sh["layer1"]["self_attn"]["out_proj"]["kernel"].spec == (
        jax.sharding.PartitionSpec("model", None)
    )


def test_dryrun_multichip_8dev():
    # the driver's multi-chip validation: full train step on a dp x tp mesh
    m = _graft()
    m.dryrun_multichip(8)


def test_dp_sharded_matches_single_device():
    """One DP-sharded train step must produce the same loss as unsharded."""
    m = _graft()
    import jax

    from espresso_tpu.config import EspressoConfig
    from espresso_tpu.criterions import build_criterion
    from espresso_tpu.train.trainer import (
        build_optimizer,
        create_train_state,
        make_train_step,
    )

    vocab, feat_dim, B = 16, 8, 8
    model = m._make_model(vocab_size=vocab, feat_dim=feat_dim, layers=1, dim=16, heads=2)
    rng = np.random.default_rng(0)
    frames, lengths, prev, target, tgt_lengths = m._example_batch(
        rng, B=B, T=32, U=5, feat_dim=feat_dim, vocab=vocab
    )
    cfg = EspressoConfig()
    cfg.common.dtype = "float32"
    cfg.criterion.name = "transducer_loss"

    class _D:
        def pad(self):
            return 1

        def blank(self):
            return 0

    class _T:
        dictionary = _D()

    criterion = build_criterion(cfg.criterion, _T())
    optimizer, _ = build_optimizer(cfg)
    batch = {
        "src_frames": frames,
        "src_lengths": lengths,
        "prev_output_tokens": prev,
        "target": target,
        "tgt_lengths": tgt_lengths,
        "weight": jnp.ones((B,), jnp.float32),
    }
    state = create_train_state(model, optimizer, batch, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, criterion, optimizer, cfg))
    stacked = {k: v[None] for k, v in batch.items()}

    # unsharded
    _, metrics_ref = step(state, stacked, jax.random.PRNGKey(1))

    # dp-sharded over 8 devices
    mesh = make_mesh(8, 1)
    state_sh = state.replace(
        params=jax.device_put(state.params, replicated(mesh)),
        opt_state=jax.device_put(state.opt_state, replicated(mesh)),
        batch_stats=jax.device_put(state.batch_stats, replicated(mesh)),
    )
    bsh = batch_sharding(mesh, has_microbatch_axis=True)
    stacked_sh = {k: jax.device_put(v, bsh) for k, v in stacked.items()}
    _, metrics_sh = step(state_sh, stacked_sh, jax.random.PRNGKey(1))

    assert np.allclose(
        float(metrics_ref["loss"]), float(metrics_sh["loss"]), rtol=1e-4
    )
    assert np.allclose(
        float(metrics_ref["gnorm"]), float(metrics_sh["gnorm"]), rtol=1e-3
    )


def test_sequence_parallel_matches_unsharded():
    """sequence_parallel (time axis over 'model' at layer boundaries) must
    not change the math: dp2 x tp2 sharded forward == replicated forward."""
    import jax.numpy as jnp
    import numpy as np

    from espresso_tpu.models.speech_transformer import (
        SpeechTransformerConfig,
        SpeechTransformerModel,
    )
    from espresso_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(2, 2)
    kw = dict(
        feat_dim=8, vocab_size=11, conv_channels=(4,),
        conv_kernel_sizes=((3, 3),), conv_strides=((2, 2),),
        conv_norm_type="layer",
        encoder_embed_dim=16, encoder_ffn_dim=32, encoder_layers=2,
        encoder_heads=2, decoder_embed_dim=16, decoder_ffn_dim=32,
        decoder_layers=1, decoder_heads=2, dropout=0.0,
    )
    sp_model = SpeechTransformerModel(
        SpeechTransformerConfig(sequence_parallel=True, **kw)
    )
    base_model = SpeechTransformerModel(SpeechTransformerConfig(**kw))

    rng = np.random.default_rng(0)
    B, T, F = 4, 37, 8
    frames = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    lengths = jnp.asarray([37, 30, 25, 20])
    prev = jnp.asarray(rng.integers(0, 11, (B, 5)).astype(np.int32))
    variables = base_model.init(jax.random.PRNGKey(0), frames, lengths, prev)

    ref, _ = jax.jit(
        lambda v, f, l, p: base_model.apply(v, f, l, p)
    )(variables, frames, lengths, prev)
    with mesh:
        got, _ = jax.jit(
            lambda v, f, l, p: sp_model.apply(v, f, l, p)
        )(variables, frames, lengths, prev)
    err = np.abs(np.asarray(got) - np.asarray(ref)).max()
    assert err < 1e-4, err
