"""Honest train-step benchmark: Conformer-Transducer, one chip.

Measures the FULL jitted train step (forward + fused RNNT loss + backward +
clip + adam update, dropout on, bf16 compute) at the reference's flagship
operating point (conformer_transducer_librispeech.yaml:28-92 scaled to
B=16 x 10.24 s utterances) and reports ms/step plus MFU.

Timing protocol (CLAUDE.md): steps chain on device through the donated
state; the clock stops only after the final step's loss is FETCHED TO HOST
(np.asarray) — `block_until_ready` under-reports through the axon tunnel.
FLOPs come from XLA cost analysis AND an analytic count; MFU uses the
smaller of the two against the v5e bf16 peak so the number cannot exceed
physics.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

V5E_PEAK_BF16 = 197e12  # TPU v5e peak bf16 FLOP/s (public spec)


def analytic_flops(B, T, U, feat, d, ffn, layers, heads, J, V, pred_layers):
    """Forward multiply-add FLOPs (x2 per MAC) of the flagship step.

    Counts the MXU-dominant terms: conv frontend, conformer layers
    (2 macaron FFNs, MHSA incl. rel-pos scores, conv module), LSTM
    prediction net, joint projections and the (t,u,V) output matmul.
    Backward is taken as 2x forward (standard two-matmul rule)."""
    T4 = T // 4  # two stride-2 convs
    # conv frontend: 2 conv layers ch=hidden over (T, feat) — minor; count
    # conv1 (1->c, 3x3 over T x feat) + conv2 (c->c, 3x3, T/2 x feat/2)
    c = 64
    fe = 2 * (T * feat * c * 9) + 2 * (T // 2 * feat // 2 * c * c * 9)
    # per conformer layer, per token
    ffn_f = 2 * (2 * d * ffn) * 2  # two half-FFNs, each two matmuls
    qkvo = 2 * (4 * d * d)
    scores = 2 * (2 * T4 * d) * 2  # QK^T + AV, x2 for rel-pos term
    convm = 2 * (2 * d * 2 * d) + 2 * (31 * d) + 2 * (d * d)
    enc = layers * (B * T4) * (ffn_f + qkvo + scores + convm)
    # prediction net: embed + pred_layers LSTM (4 gates, in+rec)
    lstm = B * (U + 1) * pred_layers * 2 * (4 * (d * d + d * d))
    # joint: enc proj (T4) + dec proj (U+1) + output matmul over the lattice
    joint = (
        B * T4 * 2 * d * J
        + B * (U + 1) * 2 * d * J
        + B * T4 * (U + 1) * 2 * J * V
    )
    fwd = fe + enc + lstm + joint
    return 3 * fwd  # fwd + 2x fwd for backward


VOCAB, FEAT, T, U = 1024, 80, 1024, 100
D, FFN, LAYERS, HEADS, J, PRED_LAYERS = 512, 2048, 16, 8, 512, 2


def build_train_point(dropout: float = 0.1, batch_size=None):
    """Build the flagship train operating point — (model, batch, cfg,
    criterion). Shared by this bench, the profiler
    (bench_train_profile.py) and the kernel parity A/B
    (bench_attn_train_ab.py), so all three measure the SAME point (the
    round-4 norm switch had to be replicated across hand copies of this
    config; never again). ``ESPRESSO_BENCH_NORM`` /
    ``ESPRESSO_BENCH_TRAIN_B`` env knobs apply for every consumer."""
    import jax.numpy as jnp

    from espresso_tpu.config import EspressoConfig
    from espresso_tpu.criterions import build_criterion
    from espresso_tpu.models.speech_transformer import SpeechTransformerConfig
    from espresso_tpu.models.transducer import TransducerConfig, TransducerModel

    # flagship point is B=16; ESPRESSO_BENCH_TRAIN_B measures the MFU-vs-
    # batch curve (the step is floor-dominated at B=16 — see STATUS)
    B = batch_size or int(os.environ.get("ESPRESSO_BENCH_TRAIN_B", "16"))

    mcfg = TransducerConfig(
        feat_dim=FEAT,
        vocab_size=VOCAB,
        encoder=SpeechTransformerConfig(
            feat_dim=FEAT,
            vocab_size=VOCAB,
            encoder_layer_type="conformer",
            encoder_pos_type="relative",
            encoder_embed_dim=D,
            encoder_ffn_dim=FFN,
            encoder_layers=LAYERS,
            encoder_heads=HEADS,
            depthwise_conv_kernel_size=31,
            # batch norm is the reference's conformer/frontend norm AND the
            # faster one on TPU: 65.8 ms/step vs 84.0 layer-norm, same-session
            # A/B round 4 (frontend LN at full T x F is bandwidth-bound)
            conv_norm_type=os.environ.get("ESPRESSO_BENCH_NORM", "batch"),
            conformer_norm_type=os.environ.get("ESPRESSO_BENCH_NORM", "batch"),
            dropout=dropout,
        ),
        pred_embed_dim=D,
        pred_hidden_size=D,
        pred_layers=PRED_LAYERS,
        pred_dropout=dropout,
        joint_dim=J,
    )
    model = TransducerModel(mcfg)

    rng = np.random.default_rng(0)
    batch = {
        "src_frames": jnp.asarray(
            rng.standard_normal((B, T, FEAT)), jnp.float32
        ),
        "src_lengths": jnp.asarray(np.full(B, T, np.int32)),
        "prev_output_tokens": jnp.asarray(
            rng.integers(4, VOCAB, (B, U + 1)), jnp.int32
        ),
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
    return model, batch, cfg, criterion


def main():
    from espresso_tpu.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    # hardware RNG for dropout masks (cfg.common.prng_impl default;
    # threefry costs ~34 ms/step at this operating point)
    jax.config.update("jax_default_prng_impl", "rbg")

    from espresso_tpu.train.trainer import (
        build_optimizer,
        create_train_state,
        make_train_step,
    )

    model, batch, cfg, criterion = build_train_point()
    B = batch["src_frames"].shape[0]
    optimizer, _ = build_optimizer(cfg)
    state = create_train_state(model, optimizer, batch, jax.random.PRNGKey(0))
    train_step = jax.jit(
        make_train_step(model, criterion, optimizer, cfg), donate_argnums=(0,)
    )
    stacked = {k: v[None] for k, v in batch.items()}

    lowered = train_step.lower(state, stacked, jax.random.PRNGKey(1))
    compiled = lowered.compile()
    try:
        xla_flops = float(compiled.cost_analysis()["flops"])
    except Exception:
        xla_flops = float("nan")
    # XLA cost analysis cannot see inside Pallas custom calls; when the
    # RNNT loss runs as Pallas kernels (the TPU default), add the joint
    # lattice matmul FLOPs it hides: 1 logits pass forward + 3 matmul
    # passes backward (logits recompute, g_W, g_pre)
    from espresso_tpu.ops.rnnt_fused import PALLAS_MODE

    if np.isfinite(xla_flops) and PALLAS_MODE in ("auto", "on"):
        joint_fwd = B * (T // 4) * (U + 1) * 2 * J * VOCAB
        xla_flops += 4 * joint_fwd
    ana_flops = float(
        analytic_flops(B, T, U, FEAT, D, FFN, LAYERS, HEADS, J, VOCAB,
                       PRED_LAYERS)
    )
    # MFU from the SMALLER estimate: cost-analysis FLOPs can double-count
    # rematerialized ops, analytic ignores elementwise — min is conservative
    flops = min(x for x in (xla_flops, ana_flops) if np.isfinite(x))

    # warmup (compile + first dispatch)
    key = jax.random.PRNGKey(2)
    for i in range(3):
        key, sub = jax.random.split(key)
        state, metrics = compiled(state, stacked, sub)
    float(np.asarray(metrics["loss"]))  # fence

    iters = 30
    t0 = time.perf_counter()
    for i in range(iters):
        key, sub = jax.random.split(key)
        state, metrics = compiled(state, stacked, sub)
    loss = float(np.asarray(metrics["loss"]))  # host fetch closes the clock
    wall = time.perf_counter() - t0

    ms_per_step = wall / iters * 1e3
    tflops_s = flops / (wall / iters) / 1e12
    mfu = flops / (wall / iters) / V5E_PEAK_BF16
    audio_s = B * T * 0.01
    rtfx = audio_s / (wall / iters)
    print(
        json.dumps(
            {
                "metric": "conformer_transducer_train_step",
                "value": round(ms_per_step, 2),
                "unit": "ms_per_step",
                "vs_baseline": round(mfu, 4),
                "mfu": round(mfu, 4),
                "tflops_per_s": round(tflops_s, 1),
                "flops_per_step_T": round(flops / 1e12, 3),
                "xla_flops_T": round(xla_flops / 1e12, 3)
                if np.isfinite(xla_flops)
                else None,
                "analytic_flops_T": round(ana_flops / 1e12, 3),
                "train_rtfx": round(rtfx, 1),
                "loss": round(loss, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
