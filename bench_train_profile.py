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

    from bench_train import build_train_point
    from espresso_tpu.train.trainer import (
        build_optimizer,
        create_train_state,
        make_train_step,
    )

    # the SAME flagship operating point bench_train.py measures
    model, batch, cfg, criterion = build_train_point()
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
    print(f"# train step: program-envelope device time "
          f"{per_step_ms:.1f} ms/step ({ITERS} steps traced; table rows "
          f"nest inside the envelope)")
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
