"""BMUF / slowmo local-SGD data parallelism (parallel/local_sgd.py) on the
8-virtual-device CPU mesh.

Covers: (a) degenerate equivalence — block_momentum=0 + sync-every-step +
SGD must reproduce synchronous DP exactly; (b) the block-momentum filter
math vs a NumPy oracle (reference fairseq/optim/bmuf.py:147-200 semantics,
incl. Nesterov); (c) warmup broadcast + optimizer reset; (d) an end-to-end
multi-update run with consolidation.
"""

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espresso_tpu.config import EspressoConfig
from espresso_tpu.criterions import build_criterion
from espresso_tpu.parallel.local_sgd import BMUFState, BMUFTrainer
from espresso_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from espresso_tpu.train.trainer import (
    TrainState,
    build_optimizer,
    create_train_state,
    make_train_step,
)


def _graft():
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


class _D:
    def pad(self):
        return 1

    def blank(self):
        return 0


class _T:
    dictionary = _D()


def _setup(optimizer_name="sgd", clip_norm=0.0, lr=0.05):
    """Tiny transducer + criterion + uniform-shape batch (equal per-replica
    sample sizes so grad-of-mean == mean-of-grads for the SGD equivalence)."""
    m = _graft()
    B, T, U, feat, vocab = 8, 32, 5, 8, 16
    model = m._make_model(
        vocab_size=vocab, feat_dim=feat, layers=1, dim=16, heads=2
    )
    rng = np.random.default_rng(0)
    batch = {
        "src_frames": jnp.asarray(
            rng.standard_normal((B, T, feat)).astype(np.float32)
        ),
        "src_lengths": jnp.full((B,), T, jnp.int32),
        "prev_output_tokens": jnp.asarray(
            rng.integers(4, vocab, size=(B, U + 1)).astype(np.int32)
        ),
        "target": jnp.asarray(
            rng.integers(4, vocab, size=(B, U)).astype(np.int32)
        ),
        "tgt_lengths": jnp.full((B,), U, jnp.int32),
        "weight": jnp.ones((B,), jnp.float32),
    }
    cfg = EspressoConfig()
    cfg.common.dtype = "float32"
    cfg.criterion.name = "transducer_loss"
    cfg.optimizer.name = optimizer_name
    cfg.optimization.lr = [lr]
    cfg.optimization.clip_norm = clip_norm
    cfg.lr_scheduler.name = "fixed"
    criterion = build_criterion(cfg.criterion, _T())
    optimizer, _ = build_optimizer(cfg)
    state = create_train_state(model, optimizer, batch, jax.random.PRNGKey(0))
    pure_step = make_train_step(model, criterion, optimizer, cfg)
    return cfg, model, criterion, optimizer, state, pure_step, batch


def _dcfg(**kw):
    cfg = EspressoConfig()
    d = cfg.distributed
    d.ddp_backend = kw.pop("ddp_backend", "bmuf")
    for k, v in kw.items():
        setattr(d, k, v)
    return d


def test_bmuf_bm0_sync1_sgd_equals_synchronous_dp():
    """block_momentum=0 + global_sync_iter=1 + SGD + no clip: averaging the
    per-replica SGD steps IS the synchronous-DP step, so params must match
    step-for-step (dropout is 0 so per-replica rngs are inert)."""
    cfg, model, criterion, optimizer, state, pure_step, batch = _setup()
    mesh = make_mesh(8, 1)
    stacked = {k: v[None] for k, v in batch.items()}
    bsh = batch_sharding(mesh, has_microbatch_axis=True)
    dev_batch = {k: jax.device_put(v, bsh) for k, v in stacked.items()}

    # synchronous DP reference
    sync_state = state.replace(
        params=jax.device_put(state.params, replicated(mesh)),
        opt_state=jax.device_put(state.opt_state, replicated(mesh)),
        batch_stats=jax.device_put(state.batch_stats, replicated(mesh)),
    )
    sync_step = jax.jit(pure_step)
    # BMUF path
    bmuf = BMUFTrainer(
        pure_step,
        optimizer,
        mesh,
        _dcfg(block_momentum=0.0, global_sync_iter=1, warmup_iterations=0),
    )
    bstate = bmuf.init(state)

    for i in range(3):
        key = jax.random.PRNGKey(100 + i)
        sync_state, sync_metrics = sync_step(sync_state, dev_batch, key)
        bstate, bmuf_metrics = bmuf.step(bstate, dev_batch, key)

    np.testing.assert_allclose(
        float(sync_metrics["loss"]), float(bmuf_metrics["loss"]), rtol=2e-5
    )
    cons = bmuf.consolidate(bstate)
    ref = jax.tree_util.tree_map(np.asarray, sync_state.params)
    got = jax.tree_util.tree_map(np.asarray, cons.params)
    for r, g in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(r, g, rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("use_nbm", [False, True])
def test_block_momentum_matches_numpy_oracle(use_nbm):
    """Fabricated replica params -> one _block_sync -> NumPy BMUF math
    (S <- bm*S + lr*(G - avg); p <- G - S; nbm: p <- p - bm*S)."""
    mesh = make_mesh(8, 1)
    cfg, model, criterion, optimizer, state, pure_step, batch = _setup()
    bm, blr = 0.7, 0.9
    bmuf = BMUFTrainer(
        pure_step,
        optimizer,
        mesh,
        _dcfg(
            block_momentum=bm,
            block_lr=blr,
            global_sync_iter=4,
            warmup_iterations=0,
            use_nbm=use_nbm,
        ),
    )
    bstate = bmuf.init(state)

    # perturb each replica's params deterministically
    def perturb(x):
        r = jnp.arange(x.shape[0], dtype=x.dtype if x.dtype.kind == "f" else jnp.float32)
        if not jnp.issubdtype(x.dtype, jnp.floating):
            return x
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        return x + 0.01 * r.reshape(shape)

    inner = bstate.inner.replace(
        params=jax.tree_util.tree_map(perturb, bstate.inner.params)
    )
    # fabricate a nonzero momentum buffer
    smoothed = jax.tree_util.tree_map(
        lambda x: jnp.full_like(x, 0.003), bstate.smoothed_grads
    )
    bstate = bstate.replace(inner=inner, smoothed_grads=smoothed)

    # _jblock donates its input — snapshot host copies first
    glob = jax.tree_util.tree_map(np.asarray, bstate.global_params)
    stacked = jax.tree_util.tree_map(np.asarray, inner.params)
    smoothed = jax.tree_util.tree_map(np.asarray, smoothed)

    new_bstate = bmuf._jblock(bstate)
    for g, st, sm, got_p, got_sm, got_stack in zip(
        jax.tree_util.tree_leaves(glob),
        jax.tree_util.tree_leaves(stacked),
        jax.tree_util.tree_leaves(smoothed),
        jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, new_bstate.global_params)
        ),
        jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, new_bstate.smoothed_grads)
        ),
        jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, new_bstate.inner.params)
        ),
    ):
        avg = st.mean(0)
        want_sm = bm * sm + blr * (g - avg)
        want_p = g - want_sm
        if use_nbm:
            want_p = want_p - bm * want_sm
        np.testing.assert_allclose(got_sm, want_sm, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(got_p, want_p, rtol=1e-5, atol=1e-7)
        # all replicas now hold the new global model
        for r in range(got_stack.shape[0]):
            np.testing.assert_allclose(
                got_stack[r], want_p, rtol=1e-5, atol=1e-7
            )


def test_warmup_broadcasts_replica0_and_resets_opt():
    mesh = make_mesh(8, 1)
    cfg, model, criterion, optimizer, state, pure_step, batch = _setup(
        optimizer_name="adam", lr=1e-3
    )
    bmuf = BMUFTrainer(
        pure_step,
        optimizer,
        mesh,
        _dcfg(warmup_iterations=2, global_sync_iter=100, block_momentum=0.5),
    )
    bstate = bmuf.init(state)
    stacked = {k: v[None] for k, v in batch.items()}
    bsh = batch_sharding(mesh, has_microbatch_axis=True)
    dev_batch = {k: jax.device_put(v, bsh) for k, v in stacked.items()}

    # two local steps diverge the replicas; step 2 == warmup -> broadcast
    bstate, _ = bmuf.step(bstate, dev_batch, jax.random.PRNGKey(1))
    mid = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, bstate.inner.params)
    )
    assert any(
        not np.allclose(leaf[0], leaf[-1]) for leaf in mid if leaf.ndim > 1
    ), "replicas should diverge between syncs"
    bstate, _ = bmuf.step(bstate, dev_batch, jax.random.PRNGKey(2))

    leaves = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, bstate.inner.params)
    )
    for leaf in leaves:
        for r in range(1, leaf.shape[0]):
            np.testing.assert_array_equal(leaf[0], leaf[r])
    # global model == replica 0, momentum buffer zeroed
    g0 = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, bstate.global_params)
    )
    for g, leaf in zip(g0, leaves):
        np.testing.assert_array_equal(g, leaf[0])
    for s in jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, bstate.smoothed_grads)
    ):
        assert np.all(s == 0)
    # adam first moment reset to zeros (reference loads initial_state)
    mus = [
        np.asarray(x)
        for x in jax.tree_util.tree_leaves(bstate.inner.opt_state)
        if hasattr(x, "dtype") and x.dtype.kind == "f" and x.ndim > 1
    ]
    assert mus and all(np.all(mu == 0) for mu in mus)


def test_slowmo_end_to_end_loss_decreases():
    """ddp_backend=slowmo: several updates through the wrapper, consolidated
    state stays the standard TrainState layout and the loss goes down."""
    mesh = make_mesh(8, 1)
    cfg, model, criterion, optimizer, state, pure_step, batch = _setup(
        optimizer_name="adam", lr=2e-3
    )
    bmuf = BMUFTrainer(
        pure_step,
        optimizer,
        mesh,
        _dcfg(ddp_backend="slowmo", slowmo_momentum=0.5, localsgd_frequency=3),
    )
    bstate = bmuf.init(state)
    stacked = {k: v[None] for k, v in batch.items()}
    bsh = batch_sharding(mesh, has_microbatch_axis=True)
    dev_batch = {k: jax.device_put(v, bsh) for k, v in stacked.items()}

    losses = []
    for i in range(10):
        bstate, metrics = bmuf.step(
            bstate, dev_batch, jax.random.PRNGKey(i)
        )
        losses.append(float(metrics["loss"]) / float(metrics["sample_size"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses

    cons = bmuf.consolidate(bstate)
    assert isinstance(cons, TrainState)
    assert int(cons.step) == 10
    ref_leaves = jax.tree_util.tree_leaves(state.params)
    cons_leaves = jax.tree_util.tree_leaves(cons.params)
    assert all(
        a.shape == b.shape for a, b in zip(ref_leaves, cons_leaves)
    )


def test_bmuf_train_cli_e2e(tmp_path):
    """distributed.ddp_backend=bmuf end-to-end through the train CLI (dp8):
    trains, syncs, validates, and writes a standard-format checkpoint that
    restores into a plain TrainState."""
    from espresso_tpu.cli.train import main as train_main
    from tests.utils import make_corpus

    d = str(tmp_path)
    make_corpus(d, "train", num_utts=16, feat_dim=8, seed=0, max_words=3)
    make_corpus(d, "valid", num_utts=8, feat_dim=8, seed=1, max_words=3)
    args = [
        f"dataset.data={d}", f"checkpoint.save_dir={d}/ckpt",
        "dataset.batch_size=16", "dataset.num_batch_buckets=1",
        "dataset.required_batch_size_multiple=8", "dataset.feat_dim=8",
        "distributed.data_parallel_size=8",
        "distributed.ddp_backend=bmuf",
        "distributed.global_sync_iter=2",
        "distributed.warmup_iterations=1",
        "distributed.block_momentum=0.5",
        "model.name=speech_transformer",
        "model.conv_channels=(4,)", "model.conv_kernel_sizes=((3,3),)",
        "model.conv_strides=((2,2),)", "model.encoder_embed_dim=16",
        "model.encoder_ffn_dim=32", "model.encoder_layers=1",
        "model.encoder_heads=2", "model.decoder_embed_dim=16",
        "model.decoder_ffn_dim=32", "model.decoder_layers=1",
        "model.decoder_heads=2", "model.dropout=0.0",
        "optimization.max_epoch=2", "optimization.lr=0.001",
        "common.log_interval=1", "common.dtype=float32",
    ]
    stats = train_main(args)
    assert np.isfinite(stats["loss"])
    # checkpoint restores as a standard (unstacked) TrainState
    import os

    from espresso_tpu.train.checkpoint import load_checkpoint_state

    path = os.path.join(d, "ckpt", "checkpoint_last")
    state, _ = load_checkpoint_state(path, None)
    leaves = jax.tree_util.tree_leaves(state["params"] if isinstance(state, dict) else state.params)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
