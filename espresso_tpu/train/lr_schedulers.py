"""Learning-rate schedulers.

Rebuild of the reference scheduler set: espresso's noam
(espresso/optim/lr_scheduler/noam_lr_scheduler.py:24-70: factor · d^-0.5 ·
min(n^-0.5, n·w^-1.5) with a final_lr floor) and reduce_lr_on_plateau_v2
(:56, decay starts at --start-reduce-lr-epoch), plus the fairseq
fixed / inverse_sqrt / tri_stage / cosine / polynomial family
(fairseq/optim/lr_scheduler/). All step-based schedulers are pure
``step -> lr`` callables (optax-compatible); plateau is stateful and driven
by validation metrics from the train loop.
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional

import jax.numpy as jnp

from espresso_tpu.config import LRSchedulerConfig, OptimizationConfig
from espresso_tpu.registry import LR_SCHEDULERS


def build_lr_schedule(
    cfg: LRSchedulerConfig, opt_cfg: OptimizationConfig
) -> Callable[[int], float]:
    base_lr = opt_cfg.lr[0]
    name = cfg.name

    if name == "fixed":
        def sched(step):
            init = cfg.warmup_init_lr if cfg.warmup_init_lr >= 0 else base_lr
            w = max(cfg.warmup_updates, 1)
            warm = init + (base_lr - init) * step / w
            return jnp.where(step < cfg.warmup_updates, warm, base_lr)

    elif name == "noam":
        # reference :24-70 — factor ties to model_size and warmup
        def sched(step):
            n = jnp.maximum(step, 1).astype(jnp.float32)
            w = max(cfg.warmup_updates, 1)
            lr = (
                base_lr
                * cfg.model_size ** -0.5
                * jnp.minimum(n ** -0.5, n * w ** -1.5)
            )
            return jnp.maximum(lr, cfg.final_lr)

    elif name == "inverse_sqrt":
        def sched(step):
            w = max(cfg.warmup_updates, 1)
            init = cfg.warmup_init_lr if cfg.warmup_init_lr >= 0 else 0.0
            stepf = jnp.maximum(step, 1).astype(jnp.float32)
            warm = init + (base_lr - init) * stepf / w
            decay = base_lr * (w ** 0.5) * (stepf ** -0.5)
            return jnp.where(step < w, warm, decay)

    elif name == "tri_stage":
        # warmup → hold → exponential decay → final floor
        if cfg.phase_ratio is not None and cfg.total_num_update > 0:
            warmup = int(cfg.total_num_update * cfg.phase_ratio[0])
            hold = int(cfg.total_num_update * cfg.phase_ratio[1])
            decay = int(cfg.total_num_update * cfg.phase_ratio[2])
        else:
            warmup, hold, decay = (
                cfg.warmup_updates,
                cfg.hold_steps,
                cfg.decay_steps,
            )
        init_lr = cfg.init_lr_scale * base_lr
        final_lr = cfg.final_lr_scale * base_lr
        factor = -math.log(cfg.final_lr_scale) / max(decay, 1)

        def sched(step):
            stepf = jnp.asarray(step, jnp.float32)
            warm = init_lr + (base_lr - init_lr) * stepf / max(warmup, 1)
            step3 = stepf - warmup - hold
            decayed = base_lr * jnp.exp(-factor * jnp.maximum(step3, 0.0))
            lr = jnp.where(
                stepf < warmup,
                warm,
                jnp.where(
                    stepf < warmup + hold,
                    base_lr,
                    jnp.where(step3 <= decay, decayed, final_lr),
                ),
            )
            return lr

    elif name == "cosine":
        def sched(step):
            w = cfg.warmup_updates
            init = cfg.warmup_init_lr if cfg.warmup_init_lr >= 0 else 0.0
            stepf = jnp.asarray(step, jnp.float32)
            warm = init + (base_lr - init) * stepf / max(w, 1)
            total = max(cfg.total_num_update - w, 1)
            t = jnp.minimum(stepf - w, total)
            min_lr = cfg.final_lr
            cos_lr = min_lr + 0.5 * (base_lr - min_lr) * (
                1 + jnp.cos(math.pi * t / total)
            )
            return jnp.where((w > 0) & (stepf < w), warm, cos_lr)

    elif name == "polynomial":
        def sched(step):
            w = cfg.warmup_updates
            stepf = jnp.asarray(step, jnp.float32)
            warm = base_lr * stepf / max(w, 1)
            total = max(cfg.total_num_update, 1)
            span = max(total - w, 1)
            remaining = jnp.clip(1 - (stepf - w) / span, 0.0, 1.0)
            poly = (base_lr - cfg.final_lr) * (remaining ** cfg.power) + cfg.final_lr
            lr = jnp.where((w > 0) & (stepf < w), warm, poly)
            return jnp.where(stepf >= total, cfg.final_lr, lr)

    elif name == "triangular":
        # fairseq triangular_lr_scheduler: cyclical between base_lr and
        # max_lr with period lr_period_updates; max shrinks by lr_shrink
        # each full cycle
        assert cfg.max_lr > base_lr and cfg.lr_period_updates > 0

        def sched(step):
            stepf = jnp.asarray(step, jnp.float32)
            period = float(cfg.lr_period_updates)
            cycle = jnp.floor(stepf / (2 * period))
            max_lr = cfg.max_lr * (cfg.lr_shrink ** cycle)
            x = jnp.abs(stepf / period - 2 * cycle - 1)
            return base_lr + (max_lr - base_lr) * jnp.maximum(0.0, 1 - x)

    elif name == "step":
        # staircase decay: lr * lr_shrink^(elapsed / decay_steps) after
        # warmup (fairseq step_lr_scheduler semantics)
        def sched(step):
            stepf = jnp.asarray(step, jnp.float32)
            w = cfg.warmup_updates
            init = cfg.warmup_init_lr if cfg.warmup_init_lr >= 0 else 0.0
            warm = init + (base_lr - init) * stepf / max(w, 1)
            n_dec = jnp.floor(
                jnp.maximum(stepf - w, 0.0) / max(cfg.decay_steps, 1)
            )
            decay = base_lr * (cfg.lr_shrink ** n_dec)
            return jnp.where((w > 0) & (stepf < w), warm, decay)

    elif name == "pass_through":
        # the reference delegates to the optimizer's own schedule; our
        # optimizers are schedule-driven already, so this is constant lr
        def sched(step):
            return jnp.asarray(base_lr, jnp.float32)

    elif name in ("reduce_lr_on_plateau", "reduce_lr_on_plateau_v2", "manual"):
        # stateful epoch-driven schedulers: the train loop rebuilds the
        # optimizer schedule when step_epoch returns a changed lr
        def sched(step):
            return jnp.asarray(base_lr, jnp.float32)

    else:
        raise ValueError(f"unknown lr scheduler {name!r}")

    return sched


class ManualScheduler:
    """Per-epoch lr table (fairseq manual_lr_scheduler's epoch2lr): entry
    ``manual_lr[epoch-1]`` applies to that epoch; the last entry persists."""

    def __init__(self, cfg: LRSchedulerConfig, opt_cfg: OptimizationConfig):
        table = cfg.manual_lr or list(opt_cfg.lr)
        self.table = list(table)
        self.lr = self.table[0]

    def step_epoch(self, epoch: int, val_metric: Optional[float]) -> float:
        # called at the END of ``epoch``: return the lr for epoch + 1
        idx = min(max(epoch, 0), len(self.table) - 1)
        self.lr = float(self.table[idx])
        return self.lr

    def state_dict(self):
        return {"lr": self.lr}

    def load_state_dict(self, d):
        self.lr = d["lr"]


class PlateauScheduler:
    """reduce_lr_on_plateau_v2 (espresso/optim/lr_scheduler/
    reduce_lr_on_plateau_v2.py): shrink LR by ``lr_shrink`` when the val
    metric stops improving, but never before ``start_reduce_lr_epoch``."""

    def __init__(self, cfg: LRSchedulerConfig, opt_cfg: OptimizationConfig):
        self.cfg = cfg
        self.lr = opt_cfg.lr[0]
        self.best: Optional[float] = None
        self.num_bad_epochs = 0
        self.patience = 0  # reference default patience 0 for v2

    def step_epoch(self, epoch: int, val_metric: Optional[float]) -> float:
        if val_metric is None:
            return self.lr
        if epoch < self.cfg.start_reduce_lr_epoch:
            self.best = None  # reference resets comparisons before the start
            return self.lr
        if self.best is None or val_metric < self.best - self.cfg.lr_threshold:
            self.best = val_metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
            if self.num_bad_epochs > self.patience:
                self.lr *= self.cfg.lr_shrink
                self.num_bad_epochs = 0
        return self.lr

    def state_dict(self):
        return {
            "lr": self.lr,
            "best": self.best,
            "num_bad_epochs": self.num_bad_epochs,
        }

    def load_state_dict(self, d):
        self.lr = d["lr"]
        self.best = d["best"]
        self.num_bad_epochs = d["num_bad_epochs"]
