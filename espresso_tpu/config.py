"""Typed configuration tree with YAML files and dotted CLI overrides.

One config system replaces the reference's dual argparse/Hydra front-ends
(fairseq/dataclass/configs.py:1194 ``FairseqConfig``; fairseq/options.py;
fairseq_cli/hydra_train.py:25). Groups mirror the reference's:
common / distributed / dataset / optimization / checkpoint / generation plus
registry-chosen task / model / criterion / optimizer / lr_scheduler nodes.

Usage:
    cfg = parse_config(argv)            # --config foo.yaml + dotted overrides
    cfg = load_config_dict({...})       # programmatic

Dotted overrides: ``optimization.lr=1e-3 model.encoder_layers=16``.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

from espresso_tpu import registry


# ---------------------------------------------------------------------------
# Config groups (reference: fairseq/dataclass/configs.py structure)
# ---------------------------------------------------------------------------


@dataclass
class CommonConfig:
    seed: int = 1
    log_interval: int = 100
    log_format: str = "simple"  # simple | json
    tensorboard_logdir: Optional[str] = None
    wandb_project: Optional[str] = None  # reference --wandb-project
    aim_repo: Optional[str] = None  # reference --aim-repo
    # numeric precision of the compute path; params are kept fp32
    dtype: str = "bfloat16"  # float32 | bfloat16
    # jax PRNG implementation for dropout/specaugment masks. threefry2x32
    # is jax's default but costs ~25% of the conformer train step in mask
    # generation on TPU; rbg uses the hardware RNG op (still
    # deterministic per key, different draws than threefry)
    prng_impl: str = "rbg"  # threefry2x32 | rbg | unsafe_rbg
    # rematerialisation policy for encoder layers: none | full | dots
    remat: str = "none"
    profile: bool = False  # jax.profiler trace of the first training steps
    # arm NaN detection (reference NanDetector, fairseq/nan_detector.py)
    debug_nans: bool = False
    # log every XLA recompilation (reference _check_xla_compilation,
    # trainer.py:1534)
    log_compiles: bool = False
    user_dir: Optional[str] = None


@dataclass
class DistributedConfig:
    # mesh axis sizes; -1 on data axis means "all remaining devices"
    data_parallel_size: int = -1
    model_parallel_size: int = 1
    # shard parameters/optimizer state over the data axis (ZeRO-3 analogue of
    # the reference's fully_sharded backend, fully_sharded_data_parallel.py:23)
    fsdp: bool = False
    # GPipe pipeline parallelism over encoder layers (reference
    # --pipeline-model-parallel, configs.py:376-434); requires a
    # speech_transformer-family model with encoder_layers divisible by it
    pipeline_parallel_size: int = 1
    pipeline_microbatches: int = 4
    # shard encoder activations' time axis over 'model' at layer boundaries
    # (Megatron sequence parallelism; needs model_parallel_size > 1)
    sequence_parallel: bool = False
    # data-parallel gradient sync mode (reference ddp_backend,
    # distributed_fairseq_model.py:35): "ddp" = synchronous (XLA psum each
    # step); "bmuf" = block-momentum update filtering (fairseq/optim/bmuf.py,
    # configs.py:781-807); "slowmo" = local SGD + slow momentum (maps onto
    # the BMUF machinery — parallel/local_sgd.py)
    ddp_backend: str = "ddp"
    # BMUF knobs (reference FairseqBMUFConfig defaults)
    global_sync_iter: int = 50
    block_momentum: float = 0.875
    block_lr: float = 1.0
    warmup_iterations: int = 500
    use_nbm: bool = False
    average_sync: bool = False
    # slowmo knobs (reference configs.py:349-367)
    slowmo_momentum: float = 0.5
    localsgd_frequency: int = 3
    # kill the job if no training progress for this many seconds (reference
    # DistributedTimeoutWrapper / --heartbeat-timeout, configs.py:335-341);
    # <= 0 disables
    heartbeat_timeout: int = -1
    # multi-host init (jax.distributed.initialize) — no-op single host
    coordinator_address: Optional[str] = None
    num_processes: int = 1
    process_id: int = 0


@dataclass
class DatasetConfig:
    data: str = ""  # directory with {split}.json manifests + dict
    dict: Optional[str] = None
    non_lang_syms: Optional[str] = None
    train_subset: str = "train"
    valid_subset: str = "valid"
    gen_subset: str = "test"
    max_tokens: Optional[int] = None  # frame budget per batch
    batch_size: Optional[int] = None
    max_source_positions: int = 6000
    max_target_positions: int = 1024
    num_batch_buckets: int = 10  # fixed-shape buckets for XLA (TPU needs this)
    required_batch_size_multiple: int = 8
    skip_invalid_size_inputs_valid_test: bool = False
    # feature extraction
    feat_dim: int = 80
    feature_type: str = "precomputed"  # precomputed | fbank | mfcc | device_fbank | waveform
    sample_rate: int = 16000
    global_cmvn_stats_path: Optional[str] = None
    specaugment_config: Optional[str] = None
    # train-time transforms (fairseq feature/waveform transform registries)
    speed_perturb: Optional[List[float]] = None  # e.g. [0.9, 1.0, 1.1]
    delta_deltas: bool = False  # append d/dd coefficients (3x feat dim)
    noise_augment_path: Optional[str] = None  # dir of noise .wav files
    noise_snr_min: float = 5.0
    noise_snr_max: float = 15.0
    noise_rate: float = 0.25
    # batch on src_len*tgt_len product (transducer memory batching,
    # reference asr_dataset.py:369-382)
    batch_based_on_both_src_tgt: bool = False
    data_buffer_size: int = 4  # prefetch depth
    # parallel host batch materialization (reference fairseq DataLoader
    # workers, fairseq/data/iterators.py:481-532); 0 = in-line + one
    # prefetch thread. Deterministic under workers: every stochastic
    # transform keys on (seed, epoch, utt_index).
    num_workers: int = 0
    worker_backend: str = "process"  # process | thread
    # LM token-block packing over binarized {split}.bin/.idx streams
    # (fairseq TokenBlockDataset: --tokens-per-sample / --sample-break-mode)
    tokens_per_sample: int = 512
    sample_break_mode: str = "none"  # none | complete | eos


@dataclass
class OptimizationConfig:
    max_epoch: int = 0
    max_update: int = 0
    lr: List[float] = field(default_factory=lambda: [0.001])
    clip_norm: float = 0.0
    update_freq: List[int] = field(default_factory=lambda: [1])
    sentence_avg: bool = False
    stop_min_lr: float = -1.0
    # EMA of params (reference fairseq/models/ema/ema.py + EMAConfig,
    # fairseq/dataclass/configs.py:1167-1190). 0 = off. EMA is always kept
    # fp32 here (params are fp32 masters), i.e. the reference's recommended
    # ema_fp32=True is structural.
    ema_decay: float = 0.0
    # before this many updates EMA copies the params (reference decay=0
    # semantics, ema.py:187-193)
    ema_start_update: int = 0
    ema_update_freq: int = 1  # update EMA every N model updates
    # seed the EMA copy from a checkpoint (reference ema_seed_model)
    ema_seed_model: Optional[str] = None
    # run validation with the EMA weights (reference tasks' uses_ema +
    # EMA.reverse inference path)
    ema_validate: bool = False
    # quant-noise QAT (fairseq --quant-noise-pq / --quant-noise-pq-block-size)
    quant_noise_pq: float = 0.0
    quant_noise_block_size: int = 8


@dataclass
class CheckpointConfig:
    save_dir: str = "checkpoints"
    restore_file: str = "checkpoint_last"
    save_interval: int = 1  # epochs
    save_interval_updates: int = 0
    keep_last_epochs: int = -1
    keep_best_checkpoints: int = -1
    no_save: bool = False
    no_save_optimizer_state: bool = False
    best_checkpoint_metric: str = "loss"
    maximize_best_checkpoint_metric: bool = False
    patience: int = -1
    reset_dataloader: bool = False
    reset_optimizer: bool = False
    # background checkpoint writes (reference --write-checkpoints-
    # asynchronously, checkpoint_utils.py:549-577): the device->host copy is
    # synchronous, the disk write is not; awaited at train end
    write_checkpoints_asynchronously: bool = False


@dataclass
class GenerationConfig:
    beam: int = 1
    nbest: int = 1  # hypotheses to report per utterance (interactive CLI)
    max_len_a: float = 0.0
    max_len_b: int = 200
    min_len: int = 1
    lenpen: float = 1.0
    temperature: float = 1.0
    # espresso decode extras (speech_recognize.py)
    eos_factor: Optional[float] = None
    lm_weight: float = 0.0
    lm_path: Optional[str] = None
    word_lm_path: Optional[str] = None
    subwordlm_weight: float = 0.8
    oov_penalty: float = 1e-4
    open_vocab: bool = True
    # transducer beam search (adaptive expansion search)
    expansion_beta: int = 0
    expansion_gamma: Optional[float] = None
    max_num_expansions_per_step: int = 2
    prefix_alpha: Optional[int] = None
    model_predicts_eos: bool = False
    # output-length cap as a fraction of input frames (transducer decoders;
    # the reference caps via max-len-a/b — this is the T-relative form)
    max_out_factor: float = 0.35
    # fairseq sequence_generator extras
    no_repeat_ngram_size: int = 0
    sampling: bool = False
    sampling_topk: int = -1
    sampling_topp: float = -1.0
    diverse_beam_groups: int = 1
    diverse_beam_strength: float = 0.5
    print_alignment: bool = False
    results_path: Optional[str] = None
    wer_output_filter: Optional[str] = None


@dataclass
class OptimizerConfig:
    name: str = "adam"
    adam_betas: Tuple[float, float] = (0.9, 0.999)
    adam_eps: float = 1e-8
    weight_decay: float = 0.0
    momentum: float = 0.0  # sgd/nag
    # composite optimizer (fairseq/optim/composite.py): per-param-group
    # settings keyed by top-level parameter name prefix, e.g.
    # groups: {encoder: {name: adam, lr_scale: 0.1}, default: {name: adam}}
    groups: Optional[Dict[str, Any]] = None


@dataclass
class LRSchedulerConfig:
    name: str = "fixed"
    warmup_updates: int = 0
    warmup_init_lr: float = -1.0
    # noam (espresso/optim/lr_scheduler/noam_lr_scheduler.py:24-70)
    model_size: int = 512
    final_lr: float = 0.0
    # tri_stage
    hold_steps: int = 0
    decay_steps: int = 0
    init_lr_scale: float = 0.01
    final_lr_scale: float = 0.01
    phase_ratio: Optional[List[float]] = None
    # plateau (reduce_lr_on_plateau_v2)
    lr_shrink: float = 0.1
    lr_threshold: float = 1e-4
    start_reduce_lr_epoch: int = 0
    # polynomial
    power: float = 1.0
    total_num_update: int = 0
    # triangular (fairseq triangular_lr_scheduler): cycle between base lr
    # and max_lr over lr_period_updates, shrinking max by lr_shrink per cycle
    max_lr: float = 0.0
    lr_period_updates: int = 0
    # manual: lr per epoch (1-indexed; the last entry persists)
    manual_lr: Optional[List[float]] = None


@dataclass
class TaskSection:
    name: str = "speech_recognition_espresso"
    # generic task options live in DatasetConfig; extra task-specific knobs:
    autoregressive: bool = True
    # scheduled sampling (espresso/tools/scheduled_sampling_rate_scheduler.py)
    scheduled_sampling: bool = False
    scheduled_sampling_probs: List[float] = field(default_factory=lambda: [1.0])
    start_scheduled_sampling_epoch: int = 1
    # hybrid task (speech_recognition_hybrid.py)
    num_targets: int = 0
    initial_state_prior_path: Optional[str] = None
    state_prior_update_interval: int = 0
    state_prior_update_smoothing: float = 0.1
    chunk_width: int = 0
    chunk_left_context: int = 0
    chunk_right_context: int = 0
    label_delay: int = 0


@dataclass
class CriterionSection:
    name: str = "label_smoothed_cross_entropy_v2"
    label_smoothing: float = 0.0
    smoothing_type: str = "uniform"  # uniform | unigram | temporal
    unigram_pseudo_count: float = 1.0
    # ctc
    ctc_weight: float = 1.0
    zero_infinity: bool = True
    # transducer
    include_eos_in_transducer_loss: bool = False
    # lattice-free fused RNNT loss (ops/rnnt_fused): O(B·C·U·V) peak memory
    # instead of the B×T×U×V lattice (1.7 GB at the flagship operating
    # point), and measured faster inside the full train step on v5e
    # (94.6 ms/step fused chunk=8 vs 98.1 lattice at B=16, T4=256, U=100,
    # V=1024 — the lattice's log-softmax bwd + label gather alone profile
    # at ~23 ms of HBM-bound time). False selects the materialized lattice.
    fused_transducer: bool = True
    # lf_mmi (chain): denominator graph in ops/chain.py npz format
    denominator_graph_path: Optional[str] = None
    # leaky-HMM denominator smoothing (reference lf_mmi_loss.py:28-31)
    leaky_hmm_coefficient: float = 1e-5
    leaky_hmm_mode: str = "stationary"  # stationary | transition | uniform
    # log a sampled REF/PRD pair every N updates (reference
    # label_smoothed_cross_entropy_v2.py:31-35; 0 disables)
    print_training_sample_interval: int = 0
    # wav2vec2 pretraining (fairseq wav2vec_criterion loss_weights)
    diversity_loss_weight: float = 0.1
    features_penalty_weight: float = 10.0
    # Gumbel temperature anneal: max(end, start * decay^update)
    # (fairseq wav2vec2 latent_temp (2.0, 0.5, 0.999995))
    gumbel_temp_start: float = 2.0
    gumbel_temp_end: float = 0.5
    gumbel_temp_decay: float = 0.999995


@dataclass
class EspressoConfig:
    """Root config (reference FairseqConfig analogue, configs.py:1194)."""

    common: CommonConfig = field(default_factory=CommonConfig)
    distributed: DistributedConfig = field(default_factory=DistributedConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    optimization: OptimizationConfig = field(default_factory=OptimizationConfig)
    checkpoint: CheckpointConfig = field(default_factory=CheckpointConfig)
    generation: GenerationConfig = field(default_factory=GenerationConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    lr_scheduler: LRSchedulerConfig = field(default_factory=LRSchedulerConfig)
    task: TaskSection = field(default_factory=TaskSection)
    criterion: CriterionSection = field(default_factory=CriterionSection)
    # model section is dynamic: chosen by `model.name` / `--arch`
    model: Dict[str, Any] = field(default_factory=lambda: {"name": "speech_lstm"})


# ---------------------------------------------------------------------------
# Parsing
# ---------------------------------------------------------------------------


def _coerce(value: str) -> Any:
    """Parse a CLI string into bool/int/float/list/str. Bracketed values are
    literal-evaluated (the reference's evaluatable-string convention for conv
    shapes, speech_lstm.py:46-57)."""
    if value[:1] in ("(", "[", "{"):
        import ast

        return ast.literal_eval(value)
    low = value.lower()
    if low in ("true", "yes"):
        return True
    if low in ("false", "no"):
        return False
    if low in ("none", "null"):
        return None
    try:
        return int(value)
    except ValueError:
        pass
    try:
        return float(value)
    except ValueError:
        pass
    if "," in value:
        return [_coerce(v) for v in value.split(",") if v != ""]
    return value


def _set_dotted(obj: Any, dotted: str, value: Any) -> None:
    parts = dotted.split(".")
    for part in parts[:-1]:
        if isinstance(obj, dict):
            obj = obj.setdefault(part, {})
        else:
            obj = getattr(obj, part)
    last = parts[-1]
    if isinstance(obj, dict):
        obj[last] = value
        return
    if not hasattr(obj, last):
        raise KeyError(f"unknown config key {dotted!r}")
    cur = getattr(obj, last)
    if isinstance(cur, list) and not isinstance(value, list) and value is not None:
        value = [value]
    if isinstance(cur, tuple) and isinstance(value, list):
        value = tuple(value)
    setattr(obj, last, value)


def _merge_dict_into(cfg: Any, data: Dict[str, Any], prefix: str = "") -> None:
    for key, value in data.items():
        path = f"{prefix}{key}"
        if isinstance(value, dict) and not isinstance(
            getattr(cfg, key, None) if not isinstance(cfg, dict) else cfg.get(key),
            (str, int, float, list),
        ):
            target = (
                cfg.get(key) if isinstance(cfg, dict) else getattr(cfg, key, None)
            )
            if dataclasses.is_dataclass(target) or isinstance(target, dict):
                _merge_dict_into(target, value, prefix=f"{path}.")
                continue
        _set_dotted(cfg, key, value)


def load_config_dict(data: Dict[str, Any]) -> EspressoConfig:
    cfg = EspressoConfig()
    _merge_dict_into(cfg, data)
    return cfg


def _flatten_keys(data: Dict[str, Any], prefix: str = "") -> List[str]:
    keys = []
    for k, v in data.items():
        path = f"{prefix}{k}"
        if isinstance(v, dict) and v:
            keys.extend(_flatten_keys(v, prefix=f"{path}."))
        else:
            keys.append(path)
    return keys


def parse_config(argv: List[str]) -> EspressoConfig:
    """Parse ``[--config file.yaml] key.path=value ...`` into an EspressoConfig.

    Every key the user explicitly set — through YAML or argv — is recorded
    in ``cfg._explicit_keys`` so later passes (apply_saved_model_cfg) can
    distinguish a deliberate value from a dataclass default."""
    # every CLI funnels through here before touching jax: turn on the
    # persistent XLA compilation cache so repeat invocations at the same
    # operating point (decode reruns, resumed training, benches) skip the
    # minutes-long cold compile (espresso_tpu/compile_cache.py)
    from espresso_tpu.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    cfg = EspressoConfig()
    explicit: set = set()
    overrides: List[Tuple[str, Any]] = []
    i = 0
    while i < len(argv):
        arg = argv[i]
        if arg == "--config":
            import yaml

            with open(argv[i + 1]) as f:
                data = yaml.safe_load(f) or {}
            _merge_dict_into(cfg, data)
            explicit.update(_flatten_keys(data))
            i += 2
            continue
        if "=" in arg:
            key, _, value = arg.partition("=")
            key = key.lstrip("-").replace("-", "_")
            overrides.append((key, _coerce(value)))
            explicit.add(key)
            i += 1
            continue
        raise ValueError(f"unrecognized argument {arg!r} (use key.path=value)")
    for key, value in overrides:
        _set_dotted(cfg, key, value)
    cfg._explicit_keys = explicit
    if cfg.common.user_dir:
        # load external plugins before any registry lookup (the reference
        # imports --user-dir during options parsing, fairseq/options.py ->
        # utils.import_user_module); every CLI goes through parse_config
        from espresso_tpu.registry import import_user_module

        import_user_module(cfg.common.user_dir)
    return cfg


def apply_saved_model_cfg(cfg, argv: Optional[List[str]] = None):
    """Decode-time model reconstruction (reference ``load_model_ensemble``'s
    saved-cfg restore, espresso/speech_recognize.py:109 ``task_cfg=saved_cfg.task``):
    if the checkpoint dir has a ``model_cfg.json`` written by the train CLI,
    use the fully-resolved model section saved there, so decode commands don't
    need to repeat every ``model.*`` flag. Explicit ``model.*`` CLI overrides
    still win (reference ``--model-overrides``)."""
    import json
    import os

    path = os.path.join(cfg.checkpoint.save_dir, "model_cfg.json")
    if not os.path.exists(path):
        return cfg
    with open(path) as f:
        blob = json.load(f)
    if "name" not in blob:  # written before the section name was recorded
        return cfg
    saved_cfg: Dict[str, Any] = dict(blob.get("config") or {})
    saved_cfg.pop("name", None)  # keep the recorded arch name authoritative
    section: Dict[str, Any] = {"name": blob["name"], **saved_cfg}

    # overlay every model override the user actually supplied (YAML via
    # --config and key=value argv both land in cfg.model); the default
    # sentinel name is not an override
    def overlay(dst: Dict[str, Any], src: Dict[str, Any]):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                overlay(dst[k], v)
            else:
                dst[k] = v

    user_model = dict(cfg.model)
    explicit = getattr(cfg, "_explicit_keys", None)
    if explicit is not None:
        # parse_config recorded every user-set key (YAML and argv alike):
        # model.name deliberately set to the default sentinel still wins
        name_overridden = "model.name" in explicit
    else:  # cfg built programmatically — fall back to scanning argv
        name_overridden = any(
            (a.split("=", 1)[0].lstrip("-").replace("-", "_") == "model.name")
            for a in (argv or [])
            if "=" in a
        )
    if user_model.get("name") == "speech_lstm" and not name_overridden:
        user_model.pop("name", None)
    overlay(section, user_model)
    cfg.model = section
    # the criterion the model was trained with drives decoder selection
    # (tasks.build_generator dispatches transducer/CTC/attention on it);
    # restore it too so decode CLIs work without repeating criterion.name
    saved_crit = blob.get("criterion")
    crit_overridden = (
        "criterion.name" in explicit
        if explicit is not None
        else any(
            (a.split("=", 1)[0].lstrip("-").replace("-", "_") == "criterion.name")
            for a in (argv or [])
            if "=" in a
        )
    )
    if saved_crit and not crit_overridden:
        cfg.criterion.name = saved_crit
    return cfg


def config_to_dict(cfg: Any) -> Any:
    if dataclasses.is_dataclass(cfg):
        return {f.name: config_to_dict(getattr(cfg, f.name)) for f in dataclasses.fields(cfg)}
    if isinstance(cfg, (list, tuple)):
        return [config_to_dict(v) for v in cfg]
    if isinstance(cfg, dict):
        return {k: config_to_dict(v) for k, v in cfg.items()}
    return cfg
