"""Checkpoint save/load with espresso policy semantics.

Rebuild of fairseq/checkpoint_utils.py: save policy best/last/epoch/
every-N-updates/keep-K (:35-186), resume restoring model+optimizer+lr+epoch
iterator (:188-279), and checkpoint averaging
(scripts/average_checkpoints.py). Array state goes through orbax
(atomic directory rename == the reference's atomic tmp+rename); host-side
state (epoch iterator position, plateau scheduler, best metric) rides in a
JSON sidecar.

Checkpoint names mirror the reference: ``checkpoint_last``,
``checkpoint_best``, ``checkpoint{epoch}``, ``checkpoint_{epoch}_{updates}``.
"""

from __future__ import annotations

import json
import logging
import os
import re
import shutil
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


def _ckpt_path(save_dir: str, name: str) -> str:
    return os.path.join(os.path.abspath(save_dir), name)


# in-flight async writers (reference checkpoint_utils.py:549-577 keeps a
# background iopath thread and awaits it at train end)
_ASYNC_CKPTRS: List[Any] = []


def wait_for_async_saves() -> None:
    """Block until every pending async checkpoint write finishes (the
    reference's await-at-exit, fairseq_cli/train.py:210-217)."""
    while _ASYNC_CKPTRS:
        ckptr = _ASYNC_CKPTRS.pop()
        try:
            ckptr.wait_until_finished()
        finally:
            ckptr.close()


def save_checkpoint_state(
    path: str, state, host_state: Dict[str, Any], async_write: bool = False
) -> None:
    path = os.path.abspath(path)
    # never overwrite a directory an earlier async write may still be
    # finalizing; draining is cheap when the previous write already landed
    wait_for_async_saves()
    if os.path.exists(path):
        shutil.rmtree(path)
    if async_write:
        # device->host copy happens before save() returns; only the disk
        # write runs in the background, so the train loop's donated state
        # buffers are safe to reuse immediately
        ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        ckptr.save(os.path.join(path, "state"), args=ocp.args.StandardSave(state))
        _ASYNC_CKPTRS.append(ckptr)
    else:
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.join(path, "state"), state)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "host_state.json"), "w") as f:
        json.dump(host_state, f)


def load_raw_checkpoint(path: str) -> Dict[str, Any]:
    """Restore a checkpoint without an abstract target: returns the raw
    state dict (keys mirror TrainState: params / ema_params / opt_state /
    ...). Used to seed EMA from an arbitrary checkpoint (reference
    ema_seed_model -> load_ema_from_checkpoint,
    fairseq/models/ema/ema.py:86-105)."""
    wait_for_async_saves()
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.join(path, "state"))


def load_checkpoint_state(path: str, abstract_state):
    wait_for_async_saves()
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(os.path.join(path, "state"), abstract_state)
    host_path = os.path.join(path, "host_state.json")
    host_state: Dict[str, Any] = {}
    if os.path.exists(host_path):
        with open(host_path) as f:
            host_state = json.load(f)
    return state, host_state


class CheckpointManager:
    """Save policy driver (reference checkpoint_utils.save_checkpoint
    :35-186)."""

    def __init__(self, cfg, maximize_best: Optional[bool] = None):
        self.cfg = cfg.checkpoint
        self.save_dir = self.cfg.save_dir
        self.maximize_best = (
            maximize_best
            if maximize_best is not None
            else self.cfg.maximize_best_checkpoint_metric
        )
        self.best: Optional[float] = None
        self.async_write = getattr(
            self.cfg, "write_checkpoints_asynchronously", False
        )
        os.makedirs(self.save_dir, exist_ok=True)

    def _is_better(self, metric: float) -> bool:
        if self.best is None:
            return True
        return metric > self.best if self.maximize_best else metric < self.best

    def save_epoch(
        self,
        state,
        host_state: Dict[str, Any],
        epoch: int,
        val_metric: Optional[float] = None,
        end_of_epoch: bool = True,
        updates: int = 0,
    ) -> List[str]:
        if self.cfg.no_save:
            return []
        cfg = self.cfg
        saved = []
        host_state = dict(host_state)
        host_state["best"] = self.best
        if val_metric is not None and self._is_better(val_metric):
            self.best = val_metric
            host_state["best"] = self.best
            save_checkpoint_state(
                _ckpt_path(self.save_dir, "checkpoint_best"),
                state,
                host_state,
                async_write=self.async_write,
            )
            saved.append("checkpoint_best")
        if val_metric is not None and cfg.keep_best_checkpoints > 0:
            # keep the N best metric-named checkpoints
            # (reference checkpoint.best_{metric}_{value} naming, :35-186)
            name = f"checkpoint_best_{val_metric:.4f}_{epoch}"
            save_checkpoint_state(
                _ckpt_path(self.save_dir, name),
                state,
                host_state,
                async_write=self.async_write,
            )
            saved.append(name)
            best_ckpts = []
            for entry in os.listdir(self.save_dir):
                m = re.fullmatch(r"checkpoint_best_([\d.eE+-]+)_(\d+)", entry)
                if m:
                    best_ckpts.append((float(m.group(1)), entry))
            best_ckpts.sort(key=lambda t: t[0], reverse=self.maximize_best)
            for _, entry in best_ckpts[cfg.keep_best_checkpoints :]:
                shutil.rmtree(
                    _ckpt_path(self.save_dir, entry), ignore_errors=True
                )
        if end_of_epoch and cfg.save_interval > 0 and epoch % cfg.save_interval == 0:
            name = f"checkpoint{epoch}"
            save_checkpoint_state(
                _ckpt_path(self.save_dir, name),
                state,
                host_state,
                async_write=self.async_write,
            )
            saved.append(name)
        if (
            not end_of_epoch
            and cfg.save_interval_updates > 0
            and updates % cfg.save_interval_updates == 0
        ):
            name = f"checkpoint_{epoch}_{updates}"
            save_checkpoint_state(
                _ckpt_path(self.save_dir, name),
                state,
                host_state,
                async_write=self.async_write,
            )
            saved.append(name)
        save_checkpoint_state(
            _ckpt_path(self.save_dir, "checkpoint_last"),
            state,
            host_state,
            async_write=self.async_write,
        )
        saved.append("checkpoint_last")
        self._prune()
        return saved

    def _prune(self) -> None:
        keep = self.cfg.keep_last_epochs
        if keep <= 0:
            return
        epochs = []
        for name in os.listdir(self.save_dir):
            m = re.fullmatch(r"checkpoint(\d+)", name)
            if m:
                epochs.append(int(m.group(1)))
        for old in sorted(epochs)[:-keep]:
            shutil.rmtree(
                _ckpt_path(self.save_dir, f"checkpoint{old}"),
                ignore_errors=True,
            )

    def restore_path(self) -> Optional[str]:
        name = self.cfg.restore_file
        path = _ckpt_path(self.save_dir, name)
        if os.path.exists(path):
            return path
        return None


def average_checkpoints(paths: List[str], abstract_state):
    """Parameter averaging (reference scripts/average_checkpoints.py, used by
    the swbd recipe)."""
    assert paths
    acc = None
    n = 0
    for p in paths:
        state, _ = load_checkpoint_state(p, abstract_state)
        params = state.params
        if acc is None:
            acc = jax.tree_util.tree_map(
                lambda x: np.asarray(x, dtype=np.float64), params
            )
        else:
            acc = jax.tree_util.tree_map(
                lambda a, x: a + np.asarray(x, dtype=np.float64), acc, params
            )
        n += 1
        last_state = state
    avg = jax.tree_util.tree_map(lambda a: (a / n).astype(np.float32), acc)
    return last_state.replace(params=avg)
