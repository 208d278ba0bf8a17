"""Waveform/feature transforms: delta-deltas, speed perturbation, noise
augment — unit behavior + end-to-end wiring through the train CLI
(reference fairseq/data/audio/{feature,waveform}_transforms/)."""

import json
import os
import wave as wavmod
from collections import OrderedDict

import jax.numpy as jnp
import numpy as np

from espresso_tpu.features.transforms import (
    NoiseAugment,
    choose_speed_rate,
    delta_deltas,
    delta_deltas_np,
    speed_perturb,
)

from tests.test_device_features import make_wave_corpus


def _write_wav(path, samples, sr=16000):
    pcm = np.asarray(samples, np.float32).astype("<i2")
    with wavmod.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def test_delta_deltas_np_matches_device():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((17, 8)).astype(np.float32)
    host = delta_deltas_np(x)
    dev = np.asarray(delta_deltas(jnp.asarray(x)[None]))[0]
    assert host.shape == (17, 24)
    assert np.abs(host - dev).max() < 1e-5


def test_speed_perturb_lengths():
    wav = np.random.default_rng(1).standard_normal(1600).astype(np.float32)
    fast = speed_perturb(wav, 1.1)
    slow = speed_perturb(wav, 0.9)
    assert abs(len(fast) - 1600 / 1.1) <= 1
    assert abs(len(slow) - 1600 / 0.9) <= 1
    assert speed_perturb(wav, 1.0) is wav
    # deterministic per (seed, epoch, index)
    r1 = choose_speed_rate([0.9, 1.0, 1.1], 7, 3, 11)
    r2 = choose_speed_rate([0.9, 1.0, 1.1], 7, 3, 11)
    assert r1 == r2 and r1 in (0.9, 1.0, 1.1)


def test_noise_augment_mixing(tmp_path):
    rng = np.random.default_rng(2)
    noise_dir = tmp_path / "noise"
    noise_dir.mkdir()
    _write_wav(str(noise_dir / "n1.wav"), rng.standard_normal(900) * 1000)

    aug = NoiseAugment(str(noise_dir), snr_min=0.0, snr_max=0.0, rate=1.0, seed=3)
    wav = (rng.standard_normal(4000) * 2000).astype(np.float32)
    mixed = aug(wav, 16000, epoch=1, index=0)
    assert mixed.shape == wav.shape
    # at 0 dB SNR, noise power ~= signal power -> mixture power ~2x
    p_src = np.mean(wav**2)
    p_mix = np.mean(mixed.astype(np.float64) ** 2)
    assert 1.5 < p_mix / p_src < 2.5, p_mix / p_src
    # deterministic
    again = aug(wav, 16000, epoch=1, index=0)
    assert np.array_equal(mixed, again)
    # rate=0 -> no-op
    aug0 = NoiseAugment(str(noise_dir), rate=0.0, seed=3)
    assert aug0(wav, 16000, 1, 0) is wav


def test_transforms_e2e_training(tmp_path):
    """speed perturb + noise augment + delta-deltas wired through the train
    CLI on a wave-manifest corpus (host fbank path)."""
    from espresso_tpu.cli.train import main as train_main

    d = str(tmp_path)
    make_wave_corpus(d, "train", 8, seed=0)
    make_wave_corpus(d, "valid", 4, seed=1)
    noise_dir = os.path.join(d, "noise")
    os.makedirs(noise_dir)
    rng = np.random.default_rng(5)
    _write_wav(
        os.path.join(noise_dir, "babble.wav"), rng.standard_normal(5000) * 500
    )

    args = [
        f"dataset.data={d}",
        f"checkpoint.save_dir={d}/ckpt",
        "dataset.feature_type=fbank",
        "dataset.feat_dim=8",
        "dataset.max_tokens=4000",
        "dataset.num_batch_buckets=2",
        "dataset.required_batch_size_multiple=2",
        "dataset.speed_perturb=[0.9,1.0,1.1]",
        "dataset.delta_deltas=true",
        f"dataset.noise_augment_path={noise_dir}",
        "dataset.noise_rate=0.5",
        "model.name=speech_lstm",
        "model.conv_channels=(4,)",
        "model.conv_kernel_sizes=((3,3),)",
        "model.conv_strides=((2,2),)",
        "model.encoder_hidden_size=16",
        "model.encoder_layers=1",
        "model.decoder_embed_dim=8",
        "model.decoder_hidden_size=16",
        "model.decoder_out_embed_dim=16",
        "model.decoder_layers=1",
        "model.attention_dim=16",
        "model.dropout=0.0",
        "optimization.max_epoch=1",
        "optimization.lr=0.003",
        "common.log_interval=5",
        "common.dtype=float32",
    ]
    stats = train_main(args)
    assert np.isfinite(stats["loss"])
