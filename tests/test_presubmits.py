"""Presubmit regression tests (round-4 verdict task: the two one-time
manual verifications become suite-run checks).

1. The WER-parity dry-run — ``examples/parity/run_parity.py --dry-run`` —
   exercises the repo's only quality-parity chain end to end: fabricate a
   flagship-family conformer-transducer espresso checkpoint, convert it
   (``cli/convert_espresso_checkpoint``), decode a synthetic manifest via
   the real ``cli/speech_recognize`` main, decode the same manifest with a
   torch-semantics brute-force AES oracle
   (reference espresso/tools/transducer_base_decoder.py semantics), and
   assert hypothesis-level agreement with WER delta 0.0 (BASELINE.md's
   <=0.1-abs protocol, minus a real corpus which this environment lacks).

2. The AOT Mosaic-compile presubmit — ``tools/aot_check`` — compiles the
   flagship TPU programs (Pallas kernels included) through the topology
   AOT client on this CPU-only box, so a Mosaic-incompatible kernel edit
   fails in CI instead of on the next real-chip run (the round-2 RNNT
   backward rejection class of failure). ``train_fused`` covers the
   opt-in train-path attention kernel fwd+bwd inside the full train step.

Both run in subprocesses: they must configure JAX (platforms, AOT env)
before the first jax import, while this suite's conftest pins the
in-process backend to 8 virtual CPU devices.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout):
    env = dict(os.environ)
    # the suite may run with TPU-affecting knobs set; the presubmits must
    # see a clean slate (aot_check sets its own)
    for k in ("ESPRESSO_FUSED_ATTN", "ESPRESSO_FUSED_ATTN_TRAIN"):
        env.pop(k, None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, *args],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def test_parity_dry_run():
    r = _run(
        [os.path.join(REPO, "examples", "parity", "run_parity.py"),
         "--dry-run"],
        timeout=2400,
    )
    assert r.returncode == 0, (
        f"parity dry-run failed rc={r.returncode}\n"
        f"stdout tail:\n{r.stdout[-3000:]}\nstderr tail:\n{r.stderr[-3000:]}"
    )
    import json

    line = next(
        ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")
    )
    res = json.loads(line)
    assert res["mode"] == "dry_run" and res["ok"], res


@pytest.mark.parametrize(
    "programs",
    [
        pytest.param(["attention"], id="attention"),
        # plain train = the default path HEAD trains with; train_fused =
        # the opt-in ESPRESSO_FUSED_ATTN_TRAIN kernel engaged
        pytest.param(["train"], id="train"),
        pytest.param(["train_fused"], id="train_fused"),
        pytest.param(["beam", "greedy"], id="decode"),
        pytest.param(["beam_lm"], id="decode_lm"),
        pytest.param(["encoder_fused"], id="encoder_fused"),
    ],
)
def test_aot_mosaic_presubmit(programs):
    r = _run(
        ["-m", "espresso_tpu.tools.aot_check", *programs],
        timeout=2400,
    )
    assert r.returncode == 0, (
        f"aot_check {programs} failed rc={r.returncode}\n"
        f"stdout tail:\n{r.stdout[-3000:]}\nstderr tail:\n{r.stderr[-3000:]}"
    )
    for name in programs:
        assert f"AOT {name}: OK" in r.stdout, r.stdout[-2000:]
