"""Profile a decode operating point and print a top-sink table.

The round-4 verdict asked where the LM-fused decode's wall goes (beam_lm
runs at ~1/3 of the no-LM RTFx): this runs the point under
``jax.profiler.trace`` with a perfetto export — plain gzipped JSON, no
tensorflow needed — aggregates device-track event durations by op name,
and prints the top sinks normalized per decode call. The committed
breakdown lives in STATUS.md; re-run with

    python bench_decode_profile.py [beam_lm|beam|greedy] [n_top]

Reference operating point for beam_lm:
/root/reference/examples/asr_librispeech/run.sh:266-290 (beam decode with
LSTM-LM shallow fusion lm_weight=0.47).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

ITERS = 3


def load_perfetto_events(log_dir: str):
    paths = glob.glob(
        os.path.join(log_dir, "**", "*.trace.json.gz"), recursive=True
    ) + glob.glob(os.path.join(log_dir, "**", "trace.json.gz"), recursive=True)
    if not paths:
        raise FileNotFoundError(f"no perfetto trace under {log_dir}")
    # jax.profiler.trace writes a timestamped subdir per run — when a
    # fixed ESPRESSO_PROFILE_DIR is reused, pick the NEWEST trace, not
    # directory-scan order (which can silently summarize a stale run)
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return data["traceEvents"] if isinstance(data, dict) else data


def summarize(events, n_top: int):
    """Aggregate complete events on device tracks by name."""
    # process metadata names the tracks; device tracks look like
    # '/device:TPU:0 ...' or contain 'TPU' / 'XLA Op' lanes
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    device_pids = {
        pid
        for pid, name in pid_names.items()
        if "TPU" in name or "device" in name.lower()
    }
    agg = defaultdict(lambda: [0.0, 0])
    # child ops NEST inside the jit_* program envelopes on the device
    # tracks, so summing every X event double-counts (envelope + while +
    # fusions). The envelope sum is the true device time.
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        name = e.get("name", "?")
        agg[name][0] += dur
        agg[name][1] += 1
        if name.startswith("jit_"):
            total += dur
    rows = sorted(
        ((v[0], v[1], k) for k, v in agg.items()), reverse=True
    )[:n_top]
    return rows, total, pid_names


def main():
    point = sys.argv[1] if len(sys.argv) > 1 else "beam_lm"
    n_top = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from bench_decode import build_point

    decoder, variables, batch, metric, meta = build_point(point)

    import jax

    print(f"[profile] compiling + warmup ({metric})", file=sys.stderr)
    decoder.decode(variables, batch)

    log_dir = os.environ.get(
        "ESPRESSO_PROFILE_DIR",
        tempfile.mkdtemp(prefix=f"prof_{point}_"),
    )
    print(f"[profile] tracing {ITERS} decodes -> {log_dir}", file=sys.stderr)
    try:
        ctx = jax.profiler.trace(log_dir, create_perfetto_trace=True)
    except TypeError:  # older signature
        ctx = jax.profiler.trace(log_dir)
    with ctx:
        for _ in range(ITERS):
            decoder.decode(variables, batch)

    events = load_perfetto_events(log_dir)
    rows, total, pid_names = summarize(events, n_top)
    per_decode_ms = total / 1e3 / ITERS
    print(f"# {metric}: program-envelope device time "
          f"{per_decode_ms:.1f} ms/decode (B={meta['B']}, {ITERS} decodes "
          f"traced; table rows nest inside the envelope)")
    print("| ms/decode | calls/decode | op |")
    print("|---|---|---|")
    for dur_us, count, name in rows:
        print(
            f"| {dur_us / 1e3 / ITERS:8.2f} | {count // ITERS:6d} | "
            f"{name[:110]} |"
        )
    print(json.dumps({
        "metric": f"{point}_profile_device_ms_per_decode",
        "value": round(per_decode_ms, 2),
        "unit": "ms",
        "trace_dir": log_dir,
    }))


if __name__ == "__main__":
    main()
