"""Benchmark: Conformer-Transducer decode throughput (RTFx) on one chip.

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline"}.
Progress goes to stderr so an external timeout still leaves a diagnosis.

Protocol (BASELINE.md): LibriSpeech-shaped synthetic load — batches of 80-dim
fbank utterances (~6.25 s each, the test-other average) through the
reference's conformer_transducer_librispeech operating point (16-layer
conformer d=512, 2-layer LSTM predictor, joint 512,
examples/asr_librispeech/config/conformer_transducer_librispeech.yaml:28-92).
RTFx = audio_seconds_decoded / wall_seconds; target >= 500x per chip
(vs_baseline = RTFx / 500).

Robustness (the round-4 driver run timed out with no output): the measured
run happens in a CHILD process under a wall budget; on a blown budget or a
crash the parent kills it and retries once with ESPRESSO_FUSED_ATTN=off
(the plain-XLA attention path — no Mosaic kernel compiles). Both the child
and every CLI enable the persistent XLA compilation cache
(espresso_tpu/compile_cache.py, repo-local .jax_cache), so a warm re-run
skips the minutes-long cold compile entirely. Knobs:
ESPRESSO_BENCH_BUDGET_S (default 1400, sized for an external
`timeout 1500`), ESPRESSO_BENCH_NO_FORK=1 to run in-process.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

_T0 = time.monotonic()
_CHILD = None  # current measurement subprocess (for signal cleanup)


def _log(msg: str) -> None:
    print(f"[bench +{time.monotonic() - _T0:5.0f}s] {msg}", file=sys.stderr,
          flush=True)


def run_bench():
    from espresso_tpu.compile_cache import enable_persistent_cache

    cache_dir = enable_persistent_cache()
    _log(f"persistent compile cache: {cache_dir or 'disabled'}")

    import jax
    import jax.numpy as jnp

    from espresso_tpu.data.dictionary import AsrDictionary
    from espresso_tpu.models.speech_transformer import SpeechTransformerConfig
    from espresso_tpu.models.transducer import TransducerConfig, TransducerModel

    _log(f"backend={jax.default_backend()} devices={jax.devices()}")

    VOCAB = 1024  # BPE-size vocab (reference librispeech recipe)
    FEAT_DIM = 80
    B = int(os.environ.get("ESPRESSO_BENCH_B", "256"))  # serving batch
    T = 624  # 6.24 s per utterance at 10 ms frames
    FRAME_SHIFT_S = 0.01

    cfg = TransducerConfig(
        feat_dim=FEAT_DIM,
        vocab_size=VOCAB,
        encoder=SpeechTransformerConfig(
            feat_dim=FEAT_DIM,
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
            dropout=0.0,
        ),
        pred_embed_dim=512,
        pred_hidden_size=512,
        pred_layers=2,
        pred_dropout=0.0,
        joint_dim=512,
    )
    model = TransducerModel(cfg)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.standard_normal((B, T, FEAT_DIM)).astype(np.float32)
    )
    lengths = jnp.asarray(np.full(B, T, np.int32))
    prev = jnp.asarray(rng.integers(4, VOCAB, size=(B, 2)).astype(np.int32))
    _log("initializing model params on device")
    variables = model.init(jax.random.PRNGKey(0), frames, lengths, prev)
    # bf16 inference (score math stays fp32 inside the decoders)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x,
        variables,
    )
    frames = frames.astype(jnp.bfloat16)

    from espresso_tpu.decode.transducer_beam import TransducerBeamSearchDecoder

    dic = AsrDictionary(enable_bos=True)
    decoder = TransducerBeamSearchDecoder(
        model,
        dic,
        beam_size=10,
        expansion_beta=2,
        expansion_gamma=2.3,
        max_num_expansions_per_step=2,
        max_out_factor=0.35,
    )
    batch = {"src_frames": frames, "src_lengths": lengths}

    _log(
        "compiling + warmup decode (cold Mosaic/XLA compiles take minutes; "
        "warm .jax_cache runs skip them)"
    )
    decoder.decode(variables, batch)
    _log("warmup done; timing 5 sustained batches")

    # sustained throughput: batches launch back-to-back (the serving
    # pipeline), so each result's host fetch overlaps the next batch's
    # device compute; wall covers first launch -> last result unpacked
    iters = 5
    t0 = time.perf_counter()
    handles = [decoder.decode_async(variables, batch) for _ in range(iters)]
    out = [decoder.collect(h) for h in handles]
    wall = time.perf_counter() - t0

    audio_seconds = iters * B * T * FRAME_SHIFT_S
    rtfx = audio_seconds / wall
    _log(f"timed {iters} batches in {wall:.2f}s -> {rtfx:.2f}x RT")
    print(
        json.dumps(
            {
                "metric": "conformer_transducer_beam10_decode_RTFx",
                "value": round(rtfx, 2),
                "unit": "x_realtime_per_chip",
                "vs_baseline": round(rtfx / 500.0, 4),
            }
        ),
        flush=True,
    )


def main():
    if (
        os.environ.get("ESPRESSO_BENCH_CHILD") == "1"
        or os.environ.get("ESPRESSO_BENCH_NO_FORK") == "1"
    ):
        run_bench()
        return

    # measured warmup spread on the tunneled v5e (2026-08-20): the same
    # cold program compiled+loaded in 168 s at 11:19 and 595 s at 12:00 —
    # the server-side compile service varies ~4x run to run. The default
    # budget assumes an external `timeout 1500` (CLAUDE.md's bench
    # invocation): attempt 1 gets 0.62*1400=868 s, the fallback ~515 s,
    # both inside the external window with margin for startup/reaping.
    budget = float(os.environ.get("ESPRESSO_BENCH_BUDGET_S", "1400"))

    # if an external timeout kills THIS process, take the child with us —
    # an orphaned child would keep holding the (single-lease) TPU
    def _reap(signum, frame):
        _log(f"signal {signum} — killing child and exiting")
        if _CHILD is not None and _CHILD.poll() is None:
            _CHILD.kill()
        sys.exit(128 + signum)

    signal.signal(signal.SIGTERM, _reap)
    signal.signal(signal.SIGINT, _reap)
    attempts = [
        ("default", {}),
        # fallback: no Pallas attention kernel in the program — the plain
        # XLA path compiles faster and avoids any Mosaic-side surprise
        ("fused-attn-off", {"ESPRESSO_FUSED_ATTN": "off"}),
    ]
    for name, extra in attempts:
        remaining = budget - (time.monotonic() - _T0)
        # cap the first attempt so a hung cold compile leaves the fallback
        # enough budget; the fallback gets everything left
        limit = min(remaining, budget * 0.62) if name == "default" else remaining
        if limit < 90:
            _log(f"only {limit:.0f}s left — skipping attempt '{name}'")
            continue
        env = dict(os.environ)
        env["ESPRESSO_BENCH_CHILD"] = "1"
        env.update(extra)
        _log(f"attempt '{name}' (limit {limit:.0f}s)")
        global _CHILD
        proc = _CHILD = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=None,  # child progress streams straight through
            text=True,
        )
        try:
            out, _ = proc.communicate(timeout=limit)
        except subprocess.TimeoutExpired:
            _log(f"attempt '{name}' blew its {limit:.0f}s limit — killing")
            proc.kill()
            proc.wait()
            time.sleep(15)  # let the tunnel drop the dead child's device lease
            continue
        if proc.returncode != 0:
            _log(f"attempt '{name}' failed rc={proc.returncode}")
            time.sleep(15)
            continue
        line = next(
            (
                ln
                for ln in reversed(out.strip().splitlines())
                if ln.startswith("{")
            ),
            None,
        )
        if line:
            print(line, flush=True)
            return
        _log(f"attempt '{name}' printed no JSON line")
    _log("all attempts failed")
    sys.exit(1)


if __name__ == "__main__":
    main()
