"""Local-SGD data parallelism: BMUF and slow-momentum (slowmo) sync modes.

TPU-native rebuild of the reference's communication-reducing DP variants:
``fairseq/optim/bmuf.py`` (block-momentum update filtering, Chen & Huo 2016,
config ``configs.py:781-807``) and the ``ddp_backend=slowmo`` fairscale
wrapper (``distributed_fairseq_model.py:28-120``). Both decouple local
optimizer steps from cross-replica synchronization: each data-parallel
replica takes ``sync_iter`` independent steps, then the replicas reconcile
through a block-momentum filter over the *parameter deltas*.

The reference implements this as per-rank processes + explicit
``dist.all_reduce``. Here the whole thing is one SPMD program:

  * replica-local state is the ordinary ``TrainState`` with every leaf
    stacked along a leading replica axis ``[R, ...]`` sharded over the
    ``data`` mesh axis — each device holds exactly one replica's copy,
    the same memory footprint as per-GPU DP;
  * a local step is ``jax.vmap`` of the unmodified train step over that
    axis: no collective appears in the compiled program, so the R replicas
    run embarrassingly parallel (this is the whole point of BMUF — the
    grad-allreduce is *gone* from the hot step);
  * the sync is a second, rarely-dispatched jitted function whose
    ``mean over axis 0`` is the only collective (XLA lowers it to one
    all-reduce over ICI).

Sync math (reference ``bmuf.py:76-200``), with ``G`` the last synced model,
``S`` the smoothed block delta, ``avg`` the replica mean:

  S <- bm * S + block_lr * (G - avg)
  params <- G - S            (+ Nesterov: params <- params - bm * S)
  G <- params

``block_momentum = 0`` degenerates to periodic model averaging (local SGD).
Warmup (reference ``_warmup_sync``): at update ``warmup_iterations`` the
replica-0 model is broadcast and local optimizer state is reset.

slowmo maps onto the same machinery: ``block_momentum = slowmo_momentum``,
sync every ``localsgd_frequency`` updates, ``block_lr = 1``, no Nesterov,
no warmup.

Checkpoint compatibility: checkpoints store the *consolidated* plain
``TrainState`` (replica mean), so decode CLIs and resume see the standard
format; the block-momentum buffer resets on resume — same behavior as the
reference, whose ``BMUF.state_dict`` delegates to the inner optimizer and
rebuilds its buffers via ``_reset_local_data`` on load.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from espresso_tpu.train.trainer import TrainState


class BMUFState(flax.struct.PyTreeNode):
    inner: TrainState  # every leaf stacked [R, ...], sharded over 'data'
    global_params: Any  # last synced model (replicated)
    smoothed_grads: Any  # block-momentum buffer (replicated)


def _is_float(x) -> bool:
    return hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)


class BMUFTrainer:
    """Wraps a pure train step with replica-local execution + periodic sync.

    ``step(state, batch, rng[, ss_prob])`` keeps the train loop's call
    signature; the sync cadence is decided host-side from the update
    counter (no device fetch — sync steps are just extra async dispatches).
    """

    def __init__(
        self,
        pure_step: Callable,
        optimizer,
        mesh: Mesh,
        dcfg,
        start_updates: int = 0,
    ):
        if dcfg.model_parallel_size > 1 or dcfg.pipeline_parallel_size > 1:
            raise ValueError("ddp_backend=bmuf/slowmo is a pure-DP mode")
        if dcfg.fsdp:
            raise ValueError("bmuf/slowmo and fsdp are mutually exclusive")
        self.mesh = mesh
        self.R = mesh.shape["data"]
        self.optimizer = optimizer
        self._n = start_updates
        if dcfg.ddp_backend == "slowmo":
            self.block_momentum = float(dcfg.slowmo_momentum)
            self.block_lr = 1.0
            self.sync_iter = int(dcfg.localsgd_frequency)
            self.use_nbm = False
            self.warmup = 0
        else:
            self.block_momentum = float(dcfg.block_momentum)
            self.block_lr = float(dcfg.block_lr)
            self.sync_iter = int(dcfg.global_sync_iter)
            self.use_nbm = bool(dcfg.use_nbm)
            self.warmup = int(dcfg.warmup_iterations)
        self.average_sync = bool(getattr(dcfg, "average_sync", False))
        self._stacked = NamedSharding(mesh, P("data"))
        self._repl = NamedSharding(mesh, P())
        self._jstep = jax.jit(self._step_impl, donate_argnums=(0,))
        self._jblock = jax.jit(self._block_sync_impl, donate_argnums=(0,))
        self._jwarmup = jax.jit(self._warmup_sync_impl, donate_argnums=(0,))
        self._pure_step = pure_step

    # -- state construction ------------------------------------------------

    def _stack(self, tree):
        R = self.R
        return jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (R,) + x.shape), tree
        )

    def init(self, state: TrainState) -> BMUFState:
        """Stack a plain (replicated) TrainState into replica-local form."""
        R = self.R

        def build(st):
            inner = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x[None], (R,) + x.shape), st
            )
            zeros = jax.tree_util.tree_map(jnp.zeros_like, st.params)
            return BMUFState(
                inner=inner, global_params=st.params, smoothed_grads=zeros
            )

        shardings = BMUFState(
            inner=jax.tree_util.tree_map(lambda _: self._stacked, state),
            global_params=jax.tree_util.tree_map(
                lambda _: self._repl, state.params
            ),
            smoothed_grads=jax.tree_util.tree_map(
                lambda _: self._repl, state.params
            ),
        )
        return jax.jit(
            build, out_shardings=shardings
        )(state)

    def consolidate(self, bstate: BMUFState) -> TrainState:
        """Replica-mean view in the standard TrainState layout (validation,
        checkpointing, decode). After a sync all replicas agree and the mean
        is exact; mid-block it is the BM=0 model average."""

        def build(bs):
            def mean0(x):
                return jnp.mean(x, 0) if _is_float(x) else x[0]

            inner = bs.inner
            return TrainState(
                step=inner.step[0],
                params=jax.tree_util.tree_map(mean0, inner.params),
                batch_stats=jax.tree_util.tree_map(mean0, inner.batch_stats),
                opt_state=jax.tree_util.tree_map(mean0, inner.opt_state),
                ema_params=jax.tree_util.tree_map(mean0, inner.ema_params),
                overflow_count=jnp.max(inner.overflow_count, axis=0),
            )

        return jax.jit(build)(bstate)

    # -- hot path ------------------------------------------------------------

    def _step_impl(self, bstate, batch, rng, ss_prob):
        """One local step per replica via shard_map over the 'data' axis.

        shard_map (not vmap-over-a-sharded-axis) is deliberate twice over:
        it states the BMUF contract in the program itself — each device runs
        the unmodified train step on its own shard, provably without
        collectives — and it sidesteps a GSPMD miscompile observed on the
        8-device CPU mesh where vmap of the full train step over a
        'data'-sharded stacked state returned one replica's update broadcast
        to the others (values were correct with the identical unsharded
        input; see tests/test_local_sgd.py).
        """
        R = self.R
        if ss_prob is None:
            ss_prob = jnp.float32(1.0)  # pure_step treats 1.0 == None

        def resh(x):
            u, B = x.shape[0], x.shape[1]
            y = x.reshape(u, R, B // R, *x.shape[2:])
            return jnp.moveaxis(y, 1, 0)  # [R, u, B/R, ...]

        batch_r = {k: resh(v) for k, v in batch.items()}
        rngs = jax.random.split(rng, R)

        def local_step(inner, b, keys, ssp):
            # local views carry a leading replica axis of size 1
            squeeze = lambda t: jax.tree_util.tree_map(lambda x: x[0], t)
            new_st, metrics = self._pure_step(
                squeeze(inner), squeeze(b), keys[0], ssp
            )
            expand = lambda t: jax.tree_util.tree_map(lambda x: x[None], t)
            return expand(new_st), expand(metrics)

        dspec = jax.tree_util.tree_map(lambda _: P("data"), bstate.inner)
        bspec = {k: P("data") for k in batch_r}
        mspec = P("data")
        inner, metrics = jax.shard_map(
            local_step,
            mesh=self.mesh,
            in_specs=(dspec, bspec, P("data"), P()),
            out_specs=(dspec, mspec),
            check_vma=False,
        )(bstate.inner, batch_r, rngs, ss_prob)
        # loss/sample_size/logging sum over replicas (matches the implicit
        # global reduction of synchronous DP); gnorm reports the mean
        agg = {
            k: (jnp.mean(v, 0) if k == "gnorm" else jnp.sum(v, 0))
            for k, v in metrics.items()
        }
        return bstate.replace(inner=inner), agg

    def _avg_opt_state(self, opt_state):
        def mean_keep_stack(x):
            if _is_float(x):
                m = jnp.mean(x, 0)
                return jnp.broadcast_to(m[None], x.shape)
            return x

        return jax.tree_util.tree_map(mean_keep_stack, opt_state)

    def _block_sync_impl(self, bstate: BMUFState) -> BMUFState:
        bm, blr = self.block_momentum, self.block_lr
        avg = jax.tree_util.tree_map(
            lambda x: jnp.mean(x, 0), bstate.inner.params
        )
        if bm == 0.0:
            new_p, new_sm = avg, bstate.smoothed_grads
        else:
            new_sm = jax.tree_util.tree_map(
                lambda s, g, a: bm * s + blr * (g - a),
                bstate.smoothed_grads,
                bstate.global_params,
                avg,
            )
            new_p = jax.tree_util.tree_map(
                lambda g, s: g - s, bstate.global_params, new_sm
            )
            if self.use_nbm:
                new_p = jax.tree_util.tree_map(
                    lambda x, s: x - bm * s, new_p, new_sm
                )
        inner = bstate.inner.replace(params=self._stack(new_p))
        if self.average_sync:
            inner = inner.replace(
                opt_state=self._avg_opt_state(inner.opt_state)
            )
        return bstate.replace(
            inner=inner, global_params=new_p, smoothed_grads=new_sm
        )

    def _warmup_sync_impl(self, bstate: BMUFState) -> BMUFState:
        """Broadcast replica 0 and reset local optimizer state + BMUF buffers
        (reference _warmup_sync, bmuf.py:110-123)."""
        p0 = jax.tree_util.tree_map(lambda x: x[0], bstate.inner.params)
        inner = bstate.inner.replace(params=self._stack(p0))
        if self.average_sync:
            inner = inner.replace(
                opt_state=self._avg_opt_state(inner.opt_state)
            )
        else:
            inner = inner.replace(
                opt_state=self._stack(self.optimizer.init(p0))
            )
        zeros = jax.tree_util.tree_map(jnp.zeros_like, p0)
        return bstate.replace(
            inner=inner, global_params=p0, smoothed_grads=zeros
        )

    # -- loop-facing API ------------------------------------------------------

    def step(self, bstate, batch, rng, ss_prob=None):
        bstate, metrics = self._jstep(bstate, batch, rng, ss_prob)
        self._n += 1
        n = self._n
        if self.warmup > 0 and n == self.warmup:
            bstate = self._jwarmup(bstate)
        elif (
            n > self.warmup
            and self.sync_iter > 0
            and n % self.sync_iter == 0
        ):
            bstate = self._jblock(bstate)
        return bstate, metrics

    def rebuild(self, pure_step: Callable, optimizer) -> Callable:
        """Swap in a re-built step/optimizer (plateau/manual LR epoch
        rebuilds) keeping the update counter and sync cadence."""
        self._pure_step = pure_step
        self.optimizer = optimizer
        self._jstep = jax.jit(self._step_impl, donate_argnums=(0,))
        self._jwarmup = jax.jit(self._warmup_sync_impl, donate_argnums=(0,))
        return self.step
