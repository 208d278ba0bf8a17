"""Reference-grade EMA of model params (train/trainer.py EMA block).

Reference semantics being rebuilt: fairseq/models/ema/ema.py (EMA.step
:175-198 — decay forced to 0 before ema_start_update so the EMA is a plain
copy, updates only every ema_update_freq-th model update, skipped updates
never touch the EMA) + EMAConfig (fairseq/dataclass/configs.py:1167-1190)
+ fairseq's tests/test_ema.py coverage model. EMA here is structurally
fp32 (params are fp32 masters == the reference's recommended ema_fp32).
Also covers: validate-with-EMA (task.uses_ema / EMA.reverse), checkpoint
round-trip of the EMA copy, and load_raw_checkpoint (ema_seed_model).
"""

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np

from espresso_tpu.config import EspressoConfig
from espresso_tpu.criterions import build_criterion
from espresso_tpu.train.trainer import (
    build_optimizer,
    create_train_state,
    make_train_step,
    make_valid_step,
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


def _setup(ema_decay=0.9, ema_start_update=0, ema_update_freq=1,
           ema_validate=False):
    m = _graft()
    B, T, U, feat, vocab = 4, 16, 4, 8, 16
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
    cfg.optimizer.name = "sgd"
    cfg.optimization.lr = [0.05]
    cfg.lr_scheduler.name = "fixed"
    cfg.optimization.ema_decay = ema_decay
    cfg.optimization.ema_start_update = ema_start_update
    cfg.optimization.ema_update_freq = ema_update_freq
    cfg.optimization.ema_validate = ema_validate
    criterion = build_criterion(cfg.criterion, _T())
    optimizer, _ = build_optimizer(cfg)
    state = create_train_state(
        model, optimizer, batch, jax.random.PRNGKey(0), ema=ema_decay > 0
    )
    step = jax.jit(
        make_train_step(model, criterion, optimizer, cfg, ema_decay=ema_decay)
    )
    mb = {k: v[None] for k, v in batch.items()}  # leading microbatch axis
    return cfg, model, criterion, state, step, mb


def _flat(tree):
    return np.concatenate(
        [np.asarray(x, np.float32).ravel() for x in jax.tree_util.tree_leaves(tree)]
    )


def test_ema_is_copy_before_start_update():
    """decay==0 before ema_start_update: EMA tracks the params exactly
    (reference ema.py:187-193 get_decay -> 0 when num_updates < start)."""
    _, _, _, state, step, mb = _setup(ema_decay=0.999, ema_start_update=5)
    rng = jax.random.PRNGKey(1)
    for i in range(3):
        state, _ = step(state, mb, jax.random.fold_in(rng, i))
        np.testing.assert_allclose(
            _flat(state.ema_params), _flat(state.params), rtol=0, atol=0
        )


def test_ema_decay_math_after_start():
    """After start: ema <- d*ema + (1-d)*params, verified vs NumPy."""
    _, _, _, state, step, mb = _setup(ema_decay=0.8, ema_start_update=0)
    ema0 = _flat(state.ema_params)
    p0 = _flat(state.params)
    np.testing.assert_allclose(ema0, p0)  # init = copy
    state, _ = step(state, mb, jax.random.PRNGKey(1))
    expect = 0.8 * ema0 + 0.2 * _flat(state.params)
    np.testing.assert_allclose(_flat(state.ema_params), expect, rtol=1e-5, atol=1e-7)
    ema1 = _flat(state.ema_params)
    state, _ = step(state, mb, jax.random.PRNGKey(2))
    expect = 0.8 * ema1 + 0.2 * _flat(state.params)
    np.testing.assert_allclose(_flat(state.ema_params), expect, rtol=1e-5, atol=1e-7)


def test_ema_update_freq_skips_off_cycle_updates():
    """ema_update_freq=2: the EMA moves only on every 2nd model update
    (reference ema.py:249-254 _step counter gate)."""
    _, _, _, state, step, mb = _setup(ema_decay=0.5, ema_update_freq=2)
    ema0 = _flat(state.ema_params)
    # update 1 (step 0 -> 1): off-cycle, EMA untouched
    state, _ = step(state, mb, jax.random.PRNGKey(1))
    np.testing.assert_allclose(_flat(state.ema_params), ema0)
    assert not np.allclose(_flat(state.params), ema0)  # params DID move
    # update 2: on-cycle, EMA moves
    state, _ = step(state, mb, jax.random.PRNGKey(2))
    expect = 0.5 * ema0 + 0.5 * _flat(state.params)
    np.testing.assert_allclose(_flat(state.ema_params), expect, rtol=1e-5, atol=1e-7)


def test_ema_untouched_on_overflow_skip():
    """A non-finite loss skips the optimizer update AND the EMA update
    (the reference raises OverflowError out of the whole update block)."""
    _, _, _, state, step, mb = _setup(ema_decay=0.5)
    bad = dict(mb)
    bad["src_frames"] = mb["src_frames"].at[0, 0, 0, 0].set(jnp.nan)
    p0, e0 = _flat(state.params), _flat(state.ema_params)
    state, metrics = step(state, bad, jax.random.PRNGKey(1))
    assert float(metrics["overflow"]) == 1.0
    np.testing.assert_allclose(_flat(state.params), p0)
    np.testing.assert_allclose(_flat(state.ema_params), e0)


def test_validate_with_ema_weights():
    """ema_validate=True evaluates with the EMA copy (reference
    task.uses_ema: valid runs under the EMA model)."""
    cfg, model, criterion, state, step, mb = _setup(
        ema_decay=0.9, ema_validate=True
    )
    # diverge EMA from params: run steps, then zero out the EMA copy
    state, _ = step(state, mb, jax.random.PRNGKey(1))
    zeros_ema = jax.tree_util.tree_map(jnp.zeros_like, state.ema_params)
    state_z = state.replace(ema_params=zeros_ema)
    vstep_ema = jax.jit(make_valid_step(model, criterion, cfg))
    cfg_plain = EspressoConfig()
    cfg_plain.common.dtype = "float32"
    cfg_plain.criterion.name = "transducer_loss"
    vstep_plain = jax.jit(make_valid_step(model, criterion, cfg_plain))
    batch = {k: v[0] for k, v in mb.items()}
    m_ema = vstep_ema(state_z, batch)
    m_plain = vstep_plain(state_z, batch)
    # zeroed-EMA loss must differ from the real-params loss
    assert not np.isclose(float(m_ema["loss"]), float(m_plain["loss"]))
    # and with EMA == params the two paths agree exactly
    state_eq = state.replace(
        ema_params=jax.tree_util.tree_map(jnp.copy, state.params)
    )
    np.testing.assert_allclose(
        float(vstep_ema(state_eq, batch)["loss"]),
        float(vstep_plain(state_eq, batch)["loss"]),
        rtol=1e-6,
    )


def test_ema_checkpoint_roundtrip(tmp_path):
    """ema_params survive save/load; load_raw_checkpoint (the
    ema_seed_model loader) exposes them without an abstract target."""
    from espresso_tpu.train.checkpoint import (
        load_checkpoint_state,
        load_raw_checkpoint,
        save_checkpoint_state,
    )

    _, _, _, state, step, mb = _setup(ema_decay=0.9)
    state, _ = step(state, mb, jax.random.PRNGKey(1))
    path = str(tmp_path / "ckpt_ema")
    save_checkpoint_state(path, state, {"epoch": 1})
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state
    )
    restored, host = load_checkpoint_state(path, abstract)
    np.testing.assert_allclose(
        _flat(restored.ema_params), _flat(state.ema_params)
    )
    raw = load_raw_checkpoint(path)
    assert "ema_params" in raw and raw["ema_params"] is not None
    np.testing.assert_allclose(
        _flat(raw["ema_params"]), _flat(state.ema_params)
    )
