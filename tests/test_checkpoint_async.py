"""Async checkpoint writes + preemption-aware save/resume
(reference checkpoint_utils.py:549-577 async iopath writes with
await-at-exit; SURVEY §5 preemption-aware TPU save)."""

import os
import signal
import subprocess
import sys
import time

import numpy as np

import espresso_tpu.train.checkpoint as ckpt_mod
from espresso_tpu.train.checkpoint import (
    load_checkpoint_state,
    save_checkpoint_state,
    wait_for_async_saves,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _state(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "w": rng.standard_normal((64, 64)).astype(np.float32),
        "b": rng.standard_normal((64,)).astype(np.float32),
        "step": np.int32(7),
    }


def test_async_save_roundtrip(tmp_path):
    state = _state()
    path = os.path.join(str(tmp_path), "ck")
    save_checkpoint_state(path, state, {"epoch": 3}, async_write=True)
    # the write is pending in the background — the caller was not blocked
    # on the disk write
    assert len(ckpt_mod._ASYNC_CKPTRS) == 1
    wait_for_async_saves()
    assert not ckpt_mod._ASYNC_CKPTRS
    abstract = {k: np.zeros_like(v) for k, v in state.items()}
    got, host = load_checkpoint_state(path, abstract)
    for k in state:
        np.testing.assert_array_equal(np.asarray(got[k]), state[k])
    assert host["epoch"] == 3


def test_async_overwrite_drains_pending(tmp_path):
    path = os.path.join(str(tmp_path), "ck")
    s1, s2 = _state(1), _state(2)
    save_checkpoint_state(path, s1, {"v": 1}, async_write=True)
    # second save of the same path must not race the pending write
    save_checkpoint_state(path, s2, {"v": 2}, async_write=True)
    abstract = {k: np.zeros_like(v) for k, v in s2.items()}
    got, host = load_checkpoint_state(path, abstract)
    np.testing.assert_array_equal(np.asarray(got["w"]), s2["w"])
    assert host["v"] == 2


def test_sigterm_saves_checkpoint_and_resumes(tmp_path):
    """Kill a training run with SIGTERM mid-run: it must save
    checkpoint_last (with iterator state) and exit cleanly; a second run
    must resume from it."""
    from tests.utils import make_corpus

    root = str(tmp_path)
    make_corpus(root, "train", num_utts=16, feat_dim=8, seed=0)
    make_corpus(root, "valid", num_utts=6, feat_dim=8, seed=1)
    save_dir = os.path.join(root, "ckpt")
    args = [
        f"dataset.data={root}",
        "dataset.max_tokens=400",
        "dataset.num_batch_buckets=2",
        "dataset.required_batch_size_multiple=2",
        "dataset.feat_dim=8",
        "model.name=speech_lstm",
        "model.conv_channels=(4,)",
        "model.conv_kernel_sizes=((3,3),)",
        "model.conv_strides=((2,2),)",
        "model.encoder_hidden_size=12",
        "model.encoder_layers=1",
        "model.decoder_embed_dim=8",
        "model.decoder_hidden_size=12",
        "model.decoder_out_embed_dim=12",
        "model.decoder_layers=1",
        "model.attention_dim=12",
        "model.dropout=0.0",
        "criterion.name=cross_entropy_v2",
        "optimization.lr=0.003",
        "optimization.max_epoch=500",
        "common.dtype=float32",
        "checkpoint.write_checkpoints_asynchronously=true",
        f"checkpoint.save_dir={save_dir}",
    ]
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from espresso_tpu.cli.train import main\n"
        f"main({args!r})\n"
    )
    proc = subprocess.Popen(
        [sys.executable, "-u", "-c", code],
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    last = os.path.join(save_dir, "checkpoint_last")
    deadline = time.time() + 300
    try:
        while time.time() < deadline:
            if os.path.exists(os.path.join(last, "host_state.json")):
                break
            if proc.poll() is not None:
                out, _ = proc.communicate()
                raise AssertionError(f"train exited early:\n{out[-3000:]}")
            time.sleep(1.0)
        else:
            raise AssertionError("no checkpoint appeared within deadline")
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=180)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, out[-3000:]
    assert "SIGTERM: saved checkpoint_last" in out, out[-3000:]
    assert os.path.exists(os.path.join(last, "host_state.json"))

    # resume: run one more epoch in-process from checkpoint_last
    from espresso_tpu.cli.train import main as train_main

    epochs_done = None
    import json

    with open(os.path.join(last, "host_state.json")) as f:
        host = json.load(f)
    metrics = train_main(
        [a for a in args if not a.startswith("optimization.max_epoch")]
        + ["optimization.max_epoch="
           + str(int(host["iterator"]["epoch"]) + 1)]
    )
    assert np.isfinite(metrics["loss"])
