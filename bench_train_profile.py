"""Profile the flagship train step and print a top-sink table.

Same perfetto machinery as bench_decode_profile.py (plain gzipped JSON,
no tensorflow), pointed at bench_train.py's operating point: the full
jitted step (fwd + RNNT Pallas loss + bwd + clip + adam, dropout on,
bf16) at B=16 x 10.24 s. The committed breakdown lives in STATUS.md.

    python bench_train_profile.py [n_top]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

ITERS = 5


def main():
    n_top = int(sys.argv[1]) if len(sys.argv) > 1 else 25

    from espresso_tpu.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import numpy as np
    import jax.numpy as jnp

    from espresso_tpu.config import EspressoConfig
    from espresso_tpu.criterions import build_criterion
    from espresso_tpu.models.speech_transformer import SpeechTransformerConfig
    from espresso_tpu.models.transducer import TransducerConfig, TransducerModel
    from espresso_tpu.train.trainer import (
        build_optimizer,
        create_train_state,
        make_train_step,
    )

    VOCAB, FEAT, B, T, U = 1024, 80, 16, 1024, 100
    mcfg = TransducerConfig(
        feat_dim=FEAT,
        vocab_size=VOCAB,
        encoder=SpeechTransformerConfig(
            feat_dim=FEAT,
            vocab_size=VOCAB,
            encoder_layer_type="conformer",
            encoder_pos_type="relative",
            encoder_embed_dim=512,
            encoder_ffn_dim=2048,
            encoder_layers=16,
            encoder_heads=8,
            depthwise_conv_kernel_size=31,
            conv_norm_type=os.environ.get("ESPRESSO_BENCH_NORM", "batch"),
            conformer_norm_type=os.environ.get("ESPRESSO_BENCH_NORM", "batch"),
            dropout=0.1,
        ),
        pred_embed_dim=512,
        pred_hidden_size=512,
        pred_layers=2,
        pred_dropout=0.1,
        joint_dim=512,
    )
    model = TransducerModel(mcfg)
    rng = np.random.default_rng(0)
    batch = {
        "src_frames": jnp.asarray(rng.standard_normal((B, T, FEAT)),
                                  jnp.float32),
        "src_lengths": jnp.asarray(np.full(B, T, np.int32)),
        "prev_output_tokens": jnp.asarray(
            rng.integers(4, VOCAB, (B, U + 1)), jnp.int32),
        "target": jnp.asarray(rng.integers(4, VOCAB, (B, U)), jnp.int32),
        "tgt_lengths": jnp.asarray(np.full(B, U, np.int32)),
        "weight": jnp.ones((B,), jnp.float32),
    }
    cfg = EspressoConfig()
    cfg.common.dtype = "bfloat16"
    cfg.criterion.name = "transducer_loss"
    cfg.optimization.clip_norm = 2.0

    class _Dict:
        def pad(self):
            return 1

        def blank(self):
            return 0

    class _Task:
        dictionary = _Dict()

    criterion = build_criterion(cfg.criterion, _Task())
    optimizer, _ = build_optimizer(cfg)
    state = create_train_state(model, optimizer, batch, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, criterion, optimizer, cfg),
                   donate_argnums=(0,))
    stacked = {k: v[None] for k, v in batch.items()}

    print("[profile] compiling + warmup train step", file=sys.stderr)
    key = jax.random.PRNGKey(2)
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, metrics = step(state, stacked, sub)
    float(np.asarray(metrics["loss"]))

    log_dir = os.environ.get(
        "ESPRESSO_PROFILE_DIR", tempfile.mkdtemp(prefix="prof_train_")
    )
    print(f"[profile] tracing {ITERS} steps -> {log_dir}", file=sys.stderr)
    try:
        ctx = jax.profiler.trace(log_dir, create_perfetto_trace=True)
    except TypeError:
        ctx = jax.profiler.trace(log_dir)
    with ctx:
        for _ in range(ITERS):
            key, sub = jax.random.split(key)
            state, metrics = step(state, stacked, sub)
        float(np.asarray(metrics["loss"]))

    from bench_decode_profile import load_perfetto_events, summarize

    events = load_perfetto_events(log_dir)
    rows, total, _ = summarize(events, n_top)
    per_step_ms = total / 1e3 / ITERS
    print(f"# train step: device-track total {per_step_ms:.1f} ms/step "
          f"({ITERS} steps traced; nested envelopes double-count)")
    print("| ms/step | calls/step | op |")
    print("|---|---|---|")
    for dur_us, count, name in rows:
        print(f"| {dur_us / 1e3 / ITERS:8.2f} | {count // ITERS:6d} | "
              f"{name[:110]} |")
    print(json.dumps({
        "metric": "train_profile_device_ms_per_step",
        "value": round(per_step_ms, 2),
        "unit": "ms",
        "trace_dir": log_dir,
    }))


if __name__ == "__main__":
    main()
