"""GPipe pipeline parallelism over the stage mesh axis (8 virtual devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espresso_tpu.parallel.pipeline import gpipe, stack_stage_params


def test_gpipe_matches_sequential_mlp():
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices()[:4])
    mesh = Mesh(devices, axis_names=("stage",))
    S, D = 4, 16
    rng = np.random.default_rng(0)
    # one dense layer per stage
    stage_params = {
        "w": jnp.asarray(rng.standard_normal((S, D, D)).astype(np.float32) * 0.3),
        "b": jnp.asarray(rng.standard_normal((S, D)).astype(np.float32) * 0.1),
    }

    def stage_fn(p, x):
        return jnp.tanh(x @ p["w"] + p["b"])

    B = 8
    x = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    y = gpipe(stage_fn, stage_params, x, num_microbatches=4, mesh=mesh)

    ref = x
    for s in range(S):
        ref = jnp.tanh(
            ref @ stage_params["w"][s] + stage_params["b"][s]
        )
    assert np.abs(np.asarray(y) - np.asarray(ref)).max() < 1e-5


def test_gpipe_multiple_layers_per_stage():
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices()[:2])
    mesh = Mesh(devices, axis_names=("stage",))
    rng = np.random.default_rng(1)
    D = 8
    # 4 layers -> 2 stages x 2 layers
    per_layer = [
        {"w": jnp.asarray(rng.standard_normal((D, D)).astype(np.float32) * 0.3)}
        for _ in range(4)
    ]
    stage_params = stack_stage_params(per_layer, layers_per_stage=2)

    def stage_fn(p, x):
        for i in range(2):
            x = jnp.tanh(x @ p["w"][i])
        return x

    B = 6
    x = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    y = gpipe(stage_fn, stage_params, x, num_microbatches=3, mesh=mesh)
    ref = x
    for lp in per_layer:
        ref = jnp.tanh(ref @ lp["w"])
    assert np.abs(np.asarray(y) - np.asarray(ref)).max() < 1e-5


def _st_cfg(**kw):
    from espresso_tpu.models.speech_transformer import SpeechTransformerConfig

    base = dict(
        feat_dim=8, vocab_size=11,
        conv_channels=(4,), conv_kernel_sizes=((3, 3),), conv_strides=((2, 2),),
        conv_norm_type="layer",
        encoder_embed_dim=16, encoder_ffn_dim=32, encoder_layers=4,
        encoder_heads=2, decoder_embed_dim=16, decoder_ffn_dim=32,
        decoder_layers=1, decoder_heads=2, dropout=0.0,
    )
    base.update(kw)
    return SpeechTransformerConfig(**base)


def test_pipelined_encoder_matches_sequential():
    """speech_transformer with pipeline_stages=2 must produce the same
    logits and gradients as the sequential model with identical weights."""
    from espresso_tpu.models.speech_transformer import SpeechTransformerModel
    from espresso_tpu.parallel.mesh import make_mesh

    make_mesh(1, 1, 2, devices=jax.devices()[:2])
    pipe_model = SpeechTransformerModel(
        _st_cfg(pipeline_stages=2, pipeline_microbatches=2)
    )
    seq_model = SpeechTransformerModel(_st_cfg())

    rng = np.random.default_rng(0)
    B, T, F = 4, 21, 8
    frames = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    lengths = jnp.asarray([21, 18, 15, 12])
    prev = jnp.asarray(rng.integers(0, 11, (B, 5)).astype(np.int32))

    pv = pipe_model.init(jax.random.PRNGKey(0), frames, lengths, prev)
    # build the sequential params from the stacked pipe params
    stacked = pv["params"]["encoder"]["pipe_layers"]["layer"]
    seq_params = {
        k: v for k, v in pv["params"].items()
    }
    enc = dict(seq_params["encoder"])
    enc.pop("pipe_layers")
    for i in range(4):
        enc[f"layer{i}"] = jax.tree_util.tree_map(lambda a: a[i], stacked)
    seq_params["encoder"] = enc

    def loss_pipe(p):
        logits, _ = pipe_model.apply({"params": p}, frames, lengths, prev)
        return (logits ** 2).mean(), logits

    def loss_seq(p):
        logits, _ = seq_model.apply({"params": p}, frames, lengths, prev)
        return (logits ** 2).mean(), logits

    (lp, logits_p), gp = jax.value_and_grad(loss_pipe, has_aux=True)(
        pv["params"]
    )
    (ls, logits_s), gs = jax.value_and_grad(loss_seq, has_aux=True)(seq_params)
    assert np.abs(np.asarray(logits_p) - np.asarray(logits_s)).max() < 1e-4
    assert abs(float(lp) - float(ls)) < 1e-6
    # gradients of the stacked layers equal the per-layer gradients
    g_stack = gp["encoder"]["pipe_layers"]["layer"]
    for i in range(4):
        gi = jax.tree_util.tree_map(lambda a: a[i], g_stack)
        ref = gs["encoder"][f"layer{i}"]
        err = max(
            float(jnp.abs(a - b).max())
            for a, b in zip(
                jax.tree_util.tree_leaves(gi), jax.tree_util.tree_leaves(ref)
            )
        )
        assert err < 1e-4, (i, err)


def test_pipeline_train_cli_e2e(tmp_path):
    """distributed.pipeline_parallel_size=2 end-to-end through the train CLI
    (dp2 x stage2 mesh on 8 virtual devices, remaining 2 unused)."""
    from espresso_tpu.cli.train import main as train_main
    from tests.utils import make_corpus

    d = str(tmp_path)
    make_corpus(d, "train", num_utts=16, feat_dim=8, seed=0, max_words=3)
    make_corpus(d, "valid", num_utts=8, feat_dim=8, seed=1, max_words=3)
    args = [
        f"dataset.data={d}", f"checkpoint.save_dir={d}/ckpt",
        "dataset.max_tokens=3200", "dataset.num_batch_buckets=1",
        "dataset.required_batch_size_multiple=4", "dataset.feat_dim=8",
        "distributed.data_parallel_size=2",
        "distributed.pipeline_parallel_size=2",
        "distributed.pipeline_microbatches=2",
        "model.name=speech_transformer",
        "model.conv_channels=(4,)", "model.conv_kernel_sizes=((3,3),)",
        "model.conv_strides=((2,2),)", "model.encoder_embed_dim=16",
        "model.encoder_ffn_dim=32", "model.encoder_layers=2",
        "model.encoder_heads=2", "model.decoder_embed_dim=16",
        "model.decoder_ffn_dim=32", "model.decoder_layers=1",
        "model.decoder_heads=2", "model.dropout=0.1",
        "optimization.max_epoch=1", "optimization.lr=0.001",
        "common.log_interval=5", "common.dtype=float32",
    ]
    stats = train_main(args)
    assert np.isfinite(stats["loss"])
