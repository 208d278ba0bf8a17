"""Training entry point (espresso-compatible semantics).

Rebuild of fairseq_cli/train.py (:44 main, epoch loop :183-206,
validate_and_save :333-434) + espresso's WER validation
(speech_recognition.py:598-629): epoch loop over a checkpointable iterator,
jitted SPMD train step, per-epoch validation (loss + greedy WER), checkpoint
policies, early stopping on patience, plateau LR stepping.

Usage:
    python -m espresso_tpu.cli.train --config cfg.yaml dataset.data=DIR \
        model.name=speech_conv_lstm_wsj optimization.max_epoch=30
"""

from __future__ import annotations

import logging

from espresso_tpu.cli.logging_utils import setup_logging
import os
import signal
import sys
import threading
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from espresso_tpu.config import EspressoConfig, parse_config
from espresso_tpu.criterions import build_criterion
from espresso_tpu.parallel.mesh import (
    batch_sharding,
    init_distributed,
    make_mesh,
    partition_params,
    replicated,
)
from espresso_tpu.tasks import setup_task
from espresso_tpu.train.checkpoint import CheckpointManager, load_checkpoint_state
from espresso_tpu.train.lr_schedulers import PlateauScheduler
from espresso_tpu.train.metrics import MetricsAggregator, ProgressLogger
from espresso_tpu.train.trainer import (
    TrainState,
    build_optimizer,
    create_train_state,
    make_train_step,
    make_valid_step,
)

logger = logging.getLogger("espresso_tpu.train")


def put_batch(batch: Dict[str, Any], sharding) -> Dict[str, jnp.ndarray]:
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            try:
                out[k] = jax.device_put(jnp.asarray(v), sharding)
            except (ValueError, TypeError):
                out[k] = jnp.asarray(v)
    return out


def validate(cfg, task, model, criterion, valid_step, state, valid_itr, scorer_cls):
    from espresso_tpu.tools.wer import Scorer
    from espresso_tpu.train.trainer import make_device_feature_fn

    prepare_features = make_device_feature_fn(cfg)
    agg = MetricsAggregator()
    decoder = task.build_valid_decoder(model)
    scorer = Scorer(task.dictionary, cfg.generation.wer_output_filter)
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    for group in valid_itr:
        n_micro = group["prev_output_tokens"].shape[0]
        for i in range(n_micro):
            mb = {
                k: v[i]
                for k, v in group.items()
                if isinstance(v, np.ndarray)
            }
            stats = valid_step(state, {k: jnp.asarray(v) for k, v in mb.items()})
            agg.update({k: float(v) for k, v in stats.items()})
            if decoder is None:
                continue
            # WER decode (reference valid_step :598-607)
            dec_mb = prepare_features(
                {k: jnp.asarray(v) for k, v in mb.items()}
            )
            dec_mb = {
                k: np.asarray(v) if hasattr(v, "shape") else v
                for k, v in dec_mb.items()
            }
            hypos = decoder.decode(variables, dec_mb)
            utt_ids = group["utt_ids"][i]
            weights = mb["weight"]
            for b, hyp in enumerate(hypos):
                if weights[b] <= 0:
                    continue
                tgt = mb["target"][b][: mb["tgt_lengths"][b]]
                ref_str = task.dictionary.tokens_to_sentence(
                    task.dictionary.string(tgt)
                )
                hyp_str = task.dictionary.tokens_to_sentence(
                    task.dictionary.string(hyp[0]["tokens"])
                )
                scorer.add_evaluation(utt_ids[b], ref_str, hyp_str)
    stats = agg.smoothed()
    if scorer.tot_word_count() > 0:
        stats["wer"] = scorer.wer()
        stats["cer"] = scorer.cer()
    return stats


def _print_training_sample(model, state, task, group, num_updates):
    """Log one sampled REF/PRD pair (reference
    label_smoothed_cross_entropy_v2.py:186-212): greedy argmax of the
    teacher-forced logits for a random row of the current batch."""
    import numpy as np

    dic = task.dictionary
    frames = np.asarray(group["src_frames"][0])
    lengths = np.asarray(group["src_lengths"][0])
    prev = np.asarray(group["prev_output_tokens"][0])
    target = np.asarray(group["target"][0])
    weight = np.asarray(group["weight"][0])
    real = np.nonzero(weight > 0)[0]
    if len(real) == 0:
        return
    rng = np.random.default_rng(num_updates)
    i = int(real[rng.integers(0, len(real))])
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    logits, _ = model.apply(
        variables,
        jnp.asarray(frames[i : i + 1]),
        jnp.asarray(lengths[i : i + 1]),
        jnp.asarray(prev[i : i + 1]),
    )
    pred = np.asarray(jnp.argmax(logits[0], axis=-1))
    tgt = target[i]
    keep = tgt != dic.pad()
    ref_toks = tgt[keep]
    pred_toks = pred[: len(tgt)][keep]
    strip = lambda t: t[t != dic.eos()]
    ref = dic.wordpiece_decode(dic.string(strip(ref_toks)))
    prd = dic.wordpiece_decode(dic.string(strip(pred_toks)))
    logger.info("sample REF: %s", ref)
    logger.info("sample PRD: %s", prd)


# set by the SIGTERM handler; the step loop checks it between updates and
# saves checkpoint_last before a clean exit (preemption-aware save)
_PREEMPT = threading.Event()


def _install_preemption_handler() -> None:
    if threading.current_thread() is not threading.main_thread():
        return

    def _on_sigterm(signum, frame):
        _PREEMPT.set()

    try:
        signal.signal(signal.SIGTERM, _on_sigterm)
    except (ValueError, OSError):  # non-main thread / restricted env
        pass


def main(argv=None) -> Dict[str, float]:
    setup_logging()
    _PREEMPT.clear()
    _install_preemption_handler()
    cfg = parse_config(argv if argv is not None else sys.argv[1:])
    if getattr(cfg.common, "prng_impl", None):
        # must precede any key creation; keys carry their impl
        jax.config.update("jax_default_prng_impl", cfg.common.prng_impl)
    np.random.seed(cfg.common.seed)
    if cfg.common.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if cfg.common.log_compiles:
        jax.config.update("jax_log_compiles", True)

    init_distributed(
        cfg.distributed.coordinator_address,
        cfg.distributed.num_processes,
        cfg.distributed.process_id,
    )
    mesh = make_mesh(
        cfg.distributed.data_parallel_size,
        cfg.distributed.model_parallel_size,
        cfg.distributed.pipeline_parallel_size,
    )
    logger.info("mesh: %s over %d devices", dict(mesh.shape), mesh.size)
    if cfg.distributed.pipeline_parallel_size > 1:
        # transducer models carry the encoder config in model.encoder.*
        section = (
            cfg.model.setdefault("encoder", {})
            if "transducer" in cfg.model.get("name", "")
            else cfg.model
        )
        section["pipeline_stages"] = cfg.distributed.pipeline_parallel_size
        section["pipeline_microbatches"] = (
            cfg.distributed.pipeline_microbatches
        )
    if cfg.distributed.sequence_parallel:
        section = (
            cfg.model.setdefault("encoder", {})
            if "transducer" in cfg.model.get("name", "")
            else cfg.model
        )
        section["sequence_parallel"] = True

    task = setup_task(cfg)
    train_ds = task.load_dataset(cfg.dataset.train_subset)
    valid_ds = task.load_dataset(cfg.dataset.valid_subset)
    model = task.build_model()
    criterion = build_criterion(cfg.criterion, task)
    logger.info("model: %s | criterion: %s", type(model).__name__, cfg.criterion.name)
    # persist the resolved model config for decode-time reconstruction
    import dataclasses as _dc
    import json as _json
    import os as _os

    _os.makedirs(cfg.checkpoint.save_dir, exist_ok=True)
    from espresso_tpu.config import config_to_dict as _ctd

    with open(_os.path.join(cfg.checkpoint.save_dir, "model_cfg.json"), "w") as f:
        _json.dump(
            {
                "model_name": type(model).__name__,
                "name": cfg.model.get("name"),
                "criterion": cfg.criterion.name,
                "config": _ctd(task.model_cfg),
            },
            f,
            indent=2,
        )

    if cfg.lr_scheduler.name == "manual" and cfg.lr_scheduler.manual_lr:
        # epoch 1 trains at the first table entry
        cfg.optimization.lr = [float(cfg.lr_scheduler.manual_lr[0])]
    optimizer, schedule = build_optimizer(cfg)
    update_freq = cfg.optimization.update_freq[0]

    shard_id = jax.process_index()
    num_shards = jax.process_count()
    train_itr = task.get_batch_iterator(
        train_ds,
        cfg.dataset.max_tokens,
        cfg.dataset.batch_size,
        seed=cfg.common.seed,
        num_shards=num_shards,
        shard_id=shard_id,
        shuffle=True,
        update_freq=update_freq,
    )

    # init state from one sample microbatch (device features resolved first)
    from espresso_tpu.train.trainer import make_device_feature_fn

    prepare_features = make_device_feature_fn(cfg)
    sample_group = train_itr.make_batches(1)[0]
    sample = train_ds.collate(sample_group[0])
    sample = prepare_features(
        {k: jnp.asarray(v) for k, v in sample.items() if isinstance(v, np.ndarray)}
    )
    rng = jax.random.PRNGKey(cfg.common.seed)
    state = create_train_state(
        model,
        optimizer,
        sample,
        rng,
        ema=cfg.optimization.ema_decay > 0,
    )
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    logger.info("num params: %s", f"{n_params:,}")

    if cfg.optimization.ema_seed_model:
        # seed the EMA copy from a checkpoint (reference EMAConfig
        # ema_seed_model -> load_ema_from_checkpoint, ema.py:86-90): prefer
        # the checkpoint's own EMA params, fall back to its model params
        from espresso_tpu.train.checkpoint import load_raw_checkpoint

        raw = load_raw_checkpoint(cfg.optimization.ema_seed_model)
        seed = raw.get("ema_params") or raw.get("params")
        assert seed is not None, "ema_seed_model checkpoint has no params"
        state = state.replace(
            ema_params=jax.tree_util.tree_map(
                lambda t, s: jnp.asarray(np.asarray(s), t.dtype),
                state.ema_params,
                seed,
            )
        )
        logger.info(
            "seeded EMA from %s", cfg.optimization.ema_seed_model
        )

    # shard: params replicated (DP) or partitioned (FSDP/TP)
    param_shardings = partition_params(
        state.params,
        mesh,
        fsdp=cfg.distributed.fsdp,
        tensor_parallel=cfg.distributed.model_parallel_size > 1,
        pipeline=cfg.distributed.pipeline_parallel_size > 1,
    )
    state = state.replace(
        params=jax.device_put(state.params, param_shardings),
        batch_stats=jax.device_put(state.batch_stats, replicated(mesh)),
        opt_state=jax.device_put(state.opt_state, replicated(mesh))
        if not cfg.distributed.fsdp
        else state.opt_state,
    )

    ckpt_mgr = CheckpointManager(cfg)
    if cfg.lr_scheduler.name.startswith("reduce_lr_on_plateau"):
        plateau = PlateauScheduler(cfg.lr_scheduler, cfg.optimization)
    elif cfg.lr_scheduler.name == "manual":
        from espresso_tpu.train.lr_schedulers import ManualScheduler

        plateau = ManualScheduler(cfg.lr_scheduler, cfg.optimization)
    else:
        plateau = None
    host_state: Dict[str, Any] = {}
    restore = ckpt_mgr.restore_path()
    if restore and not cfg.checkpoint.reset_optimizer:
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state
        )
        state, host_state = load_checkpoint_state(restore, abstract)
        # orbax restores committed single-device arrays; decommit to host
        # and re-apply the same mesh placement as fresh init, else the
        # sharded train step sees mixed device sets (the fsdp opt_state
        # stays uncommitted so XLA's sharding propagation lays it out)
        state = jax.tree_util.tree_map(lambda x: jnp.asarray(np.asarray(x)), state)
        state = state.replace(
            params=jax.device_put(state.params, param_shardings),
            batch_stats=jax.device_put(state.batch_stats, replicated(mesh)),
            opt_state=jax.device_put(state.opt_state, replicated(mesh))
            if not cfg.distributed.fsdp
            else state.opt_state,
        )
        logger.info("restored checkpoint from %s", restore)
        if not cfg.checkpoint.reset_dataloader and "iterator" in host_state:
            train_itr.load_state_dict(host_state["iterator"])
        if plateau is not None and "plateau" in host_state:
            plateau.load_state_dict(host_state["plateau"])
        ckpt_mgr.best = host_state.get("best")

    pure_step = make_train_step(
        model, criterion, optimizer, cfg, ema_decay=cfg.optimization.ema_decay
    )
    bmuf = None
    if cfg.distributed.ddp_backend in ("bmuf", "slowmo"):
        # local-SGD data parallelism: replica-local steps + periodic
        # block-momentum sync (reference fairseq/optim/bmuf.py; slowmo
        # distributed_fairseq_model.py:28-120) — parallel/local_sgd.py
        from espresso_tpu.parallel.local_sgd import BMUFTrainer

        bmuf = BMUFTrainer(
            pure_step,
            optimizer,
            mesh,
            cfg.distributed,
            start_updates=int(state.step),
        )
        state = bmuf.init(state)
        train_step = bmuf.step
        logger.info(
            "ddp_backend=%s: %d local replicas, sync every %d updates",
            cfg.distributed.ddp_backend, bmuf.R, bmuf.sync_iter,
        )
    else:
        train_step = jax.jit(pure_step, donate_argnums=(0,))
    valid_step = jax.jit(make_valid_step(model, criterion, cfg))

    def rebuild_train_step(new_lr: float):
        """Re-jit the train step with a new base lr (plateau/manual epoch
        schedulers change lr between epochs; the optax schedule closure is
        compiled in, so a change requires a rebuild — rare, epoch-boundary
        only). The optax chain structure is identical, so the existing
        opt_state carries over."""
        cfg.optimization.lr = [float(new_lr)]
        new_opt, new_schedule = build_optimizer(cfg)
        new_pure = make_train_step(
            model,
            criterion,
            new_opt,
            cfg,
            ema_decay=cfg.optimization.ema_decay,
        )
        if bmuf is not None:
            return bmuf.rebuild(new_pure, new_opt), new_schedule
        new_step = jax.jit(new_pure, donate_argnums=(0,))
        return new_step, new_schedule
    from espresso_tpu.tools.scheduled_sampling import (
        ScheduledSamplingRateScheduler,
    )

    ss_scheduler = (
        ScheduledSamplingRateScheduler(
            cfg.task.scheduled_sampling_probs,
            cfg.task.start_scheduled_sampling_epoch,
        )
        if cfg.task.scheduled_sampling
        else None
    )

    bsharding = batch_sharding(mesh, has_microbatch_axis=True)
    progress = ProgressLogger(
        cfg.common.log_interval,
        cfg.common.log_format,
        cfg.common.tensorboard_logdir,
        tag="train",
        wandb_project=cfg.common.wandb_project,
        aim_repo=cfg.common.aim_repo,
    )
    max_epoch = cfg.optimization.max_epoch or 10**9
    max_update = cfg.optimization.max_update or 10**9
    patience_left = cfg.checkpoint.patience
    num_updates = int(
        state.step if bmuf is None else state.inner.step[0]
    )
    final_stats: Dict[str, float] = {}

    # hung-job watchdog (reference DistributedTimeoutWrapper,
    # --heartbeat-timeout): pinged after every dispatched step + validation;
    # kills the process (for checkpoint-resume by the scheduler) on stall
    from espresso_tpu.train.heartbeat import HeartbeatMonitor

    hb = HeartbeatMonitor(cfg.distributed.heartbeat_timeout).start()
    try:
        state, num_updates, final_stats = _train_loop(
            cfg,
            task,
            model,
            criterion,
            train_itr,
            train_ds,
            valid_ds,
            state,
            rng,
            train_step,
            valid_step,
            schedule,
            ckpt_mgr,
            plateau,
            ss_scheduler,
            bsharding,
            progress,
            max_epoch,
            max_update,
            patience_left,
            num_updates,
            rebuild_train_step,
            hb,
            consolidate=bmuf.consolidate if bmuf is not None else None,
        )
    except Exception:
        # crash checkpoint (reference trainer.py:858-863 crash.pt)
        if not cfg.checkpoint.no_save:
            from espresso_tpu.train.checkpoint import save_checkpoint_state

            save_checkpoint_state(
                os.path.join(cfg.checkpoint.save_dir, "checkpoint_crash"),
                bmuf.consolidate(state) if bmuf is not None else state,
                {"iterator": train_itr.state_dict()},
            )
            logger.error("exception — saved checkpoint_crash")
        raise
    finally:
        hb.stop()
        # await-at-exit for async checkpoint writes
        # (reference fairseq_cli/train.py:210-217)
        from espresso_tpu.train.checkpoint import wait_for_async_saves

        wait_for_async_saves()

    logger.info("done training at %d updates", num_updates)
    return final_stats


def _train_loop(
    cfg,
    task,
    model,
    criterion,
    train_itr,
    train_ds,
    valid_ds,
    state,
    rng,
    train_step,
    valid_step,
    schedule,
    ckpt_mgr,
    plateau,
    ss_scheduler,
    bsharding,
    progress,
    max_epoch,
    max_update,
    patience_left,
    num_updates,
    rebuild_train_step=None,
    hb=None,
    consolidate=None,
):
    final_stats: Dict[str, float] = {}

    def _view(s):
        # local-SGD (bmuf/slowmo) trains a stacked BMUFState; validation,
        # checkpointing, and sample printing use the consolidated TrainState
        return consolidate(s) if consolidate is not None else s
    while train_itr.next_epoch_idx <= max_epoch and num_updates < max_update:
        epoch = train_itr.next_epoch_idx
        epoch_itr = train_itr.next_epoch_itr()
        agg = MetricsAggregator()
        t0 = time.perf_counter()
        ss_prob = (
            jnp.float32(ss_scheduler.step(epoch)) if ss_scheduler else None
        )
        profiling = cfg.common.profile and epoch == 1
        if profiling:
            import os as _os

            jax.profiler.start_trace(
                _os.path.join(cfg.checkpoint.save_dir, "profile")
            )
        # metrics stay ON DEVICE between log intervals: forcing each scalar
        # to host every step serializes the pipeline on the host link
        # (~35 ms/transfer through the TPU tunnel vs a ~14 ms step)
        _acc_metrics = jax.jit(
            lambda acc, m: jax.tree_util.tree_map(jnp.add, acc, m)
        )
        metrics_acc = None
        metrics_n = 0

        def _flush_metrics():
            nonlocal metrics_acc, metrics_n
            if metrics_acc is None:
                return
            sums = jax.device_get(metrics_acc)
            agg.update_sums({k: float(v) for k, v in sums.items()}, metrics_n)
            metrics_acc = None
            metrics_n = 0

        for group in epoch_itr:
            if _PREEMPT.is_set():
                # preemption-aware save (SURVEY §5: TPU preemption sends
                # SIGTERM): persist checkpoint_last with the mid-epoch
                # iterator position and exit cleanly for scheduler resume
                _flush_metrics()
                if not cfg.checkpoint.no_save:
                    from espresso_tpu.train.checkpoint import (
                        save_checkpoint_state,
                    )

                    save_checkpoint_state(
                        os.path.join(
                            cfg.checkpoint.save_dir, "checkpoint_last"
                        ),
                        _view(state),
                        {"iterator": train_itr.state_dict()},
                    )
                logger.info(
                    "SIGTERM: saved checkpoint_last at %d updates, exiting",
                    num_updates,
                )
                return state, num_updates, final_stats
            dev_batch = put_batch(group, bsharding)
            rng, step_rng = jax.random.split(rng)
            if ss_prob is not None:
                state, metrics = train_step(state, dev_batch, step_rng, ss_prob)
            else:
                state, metrics = train_step(state, dev_batch, step_rng)
            num_updates += 1
            if profiling and num_updates >= 5:
                jax.profiler.stop_trace()
                profiling = False
                logger.info("profile trace written to %s/profile", cfg.checkpoint.save_dir)
            metrics_acc = (
                metrics
                if metrics_acc is None
                else _acc_metrics(metrics_acc, metrics)
            )
            metrics_n += 1
            if hb is not None:
                hb.ping()
            interval = cfg.criterion.print_training_sample_interval
            if (
                interval > 0
                and num_updates % interval == 0
                and getattr(task, "dictionary", None) is not None
                and getattr(task, "autoregressive", False)
                and "src_frames" in group
            ):
                _print_training_sample(
                    model, _view(state), task, group, num_updates
                )
            if num_updates % cfg.common.log_interval == 0:
                _flush_metrics()
                stats = agg.smoothed()
                stats["lr"] = float(schedule(num_updates))
                progress.log(stats, num_updates, epoch)
            if num_updates >= max_update:
                break
            if (
                cfg.checkpoint.save_interval_updates > 0
                and num_updates % cfg.checkpoint.save_interval_updates == 0
            ):
                host_state = {"iterator": train_itr.state_dict()}
                if plateau is not None:
                    host_state["plateau"] = plateau.state_dict()
                ckpt_mgr.save_epoch(
                    _view(state), host_state, epoch,
                    end_of_epoch=False, updates=num_updates,
                )

        if profiling:
            jax.profiler.stop_trace()
        _flush_metrics()
        train_stats = agg.smoothed()
        progress.print_epoch(train_stats, epoch)

        # validation
        valid_itr_epoch = task.get_batch_iterator(
            valid_ds,
            cfg.dataset.max_tokens,
            cfg.dataset.batch_size,
            seed=cfg.common.seed,
            shuffle=False,
        ).next_epoch_itr()
        val_stats = validate(
            cfg, task, model, criterion, valid_step, _view(state),
            valid_itr_epoch, None,
        )
        if hb is not None:
            hb.ping()
        vp = ProgressLogger(log_format=cfg.common.log_format, tag="valid")
        vp.print_epoch(val_stats, epoch)
        metric_name = cfg.checkpoint.best_checkpoint_metric
        val_metric = val_stats.get(metric_name, val_stats.get("loss"))
        final_stats = {**train_stats, **{f"valid_{k}": v for k, v in val_stats.items()}}

        if plateau is not None:
            old_lr = plateau.lr
            new_lr = plateau.step_epoch(epoch, val_metric)
            if new_lr != old_lr and rebuild_train_step is not None:
                logger.info("epoch lr scheduler: lr -> %g", new_lr)
                train_step, schedule = rebuild_train_step(new_lr)

        # checkpoint + early stopping (reference validate_and_save :363-434)
        improved = ckpt_mgr.best is None or (
            val_metric < ckpt_mgr.best
            if not cfg.checkpoint.maximize_best_checkpoint_metric
            else val_metric > ckpt_mgr.best
        )
        host_state = {"iterator": train_itr.state_dict()}
        if plateau is not None:
            host_state["plateau"] = plateau.state_dict()
        ckpt_mgr.save_epoch(_view(state), host_state, epoch, val_metric=val_metric)

        # hybrid: update the HMM state prior from model posteriors
        # (reference update_state_prior, speech_recognition_hybrid.py:594)
        if hasattr(task, "update_state_prior") and len(valid_itr_epoch) >= 0:
            _update_hybrid_state_prior(cfg, task, model, _view(state), valid_ds)

        if cfg.checkpoint.patience > 0:
            patience_left = cfg.checkpoint.patience if improved else patience_left - 1
            if patience_left <= 0:
                logger.info(
                    "early stop: no improvement in %d epochs", cfg.checkpoint.patience
                )
                break

    return state, num_updates, final_stats


def _update_hybrid_state_prior(cfg, task, model, state, valid_ds):
    specs = valid_ds.make_batch_specs(
        max_tokens=cfg.dataset.max_tokens,
        max_sentences=cfg.dataset.batch_size,
        shuffle=False,
    )
    batch = valid_ds.collate(specs[0])
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    logits, enc = model.apply(
        variables,
        jnp.asarray(batch["src_frames"]),
        jnp.asarray(batch["src_lengths"]),
    )
    post = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    T = post.shape[1]
    mask = (jnp.arange(T)[None, :] < enc.src_lengths[:, None])[..., None]
    avg = np.asarray(
        (post * mask).sum(axis=(0, 1)) / jnp.maximum(mask.sum(), 1)
    )
    task.update_state_prior(avg)
    np.save(
        os.path.join(cfg.checkpoint.save_dir, "state_prior.npy"),
        np.asarray(task.state_prior, np.float32),
    )


if __name__ == "__main__":
    main()
