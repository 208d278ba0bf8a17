import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espresso_tpu.features.fbank import (
    fbank,
    fbank_numpy,
    mfcc_numpy,
    num_samples_to_num_frames,
)
from espresso_tpu.features.cmvn import utterance_cmvn, compute_global_cmvn_stats
from espresso_tpu.features.specaugment import SpecAugmentConfig, apply_specaugment


def test_frame_counting():
    # Kaldi snip_edges formula (espresso/tools/utils.py:457-487)
    assert num_samples_to_num_frames(16000) == 98
    assert num_samples_to_num_frames(399) == 0
    assert num_samples_to_num_frames(400) == 1
    assert num_samples_to_num_frames(560) == 2
    assert num_samples_to_num_frames(8000, snip_edges=False) == 50


def test_fbank_jnp_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000) * 1000).astype(np.float32)
    ref_full = fbank_numpy(wav)
    ref_half = fbank_numpy(wav[:8000])
    batch = np.stack([wav, np.pad(wav[:8000], (0, 8000))])
    out, lens = fbank(jnp.asarray(batch), jnp.asarray([16000, 8000]))
    out = np.asarray(out)
    assert out.shape == (2, 98, 80)
    assert list(np.asarray(lens)) == [98, 48]
    # oracle uses float64 FFT (numpy), device path float32 — log-domain tol
    assert np.abs(out[0, : ref_full.shape[0]] - ref_full).max() < 2e-2
    assert np.abs(out[1, : ref_half.shape[0]] - ref_half).max() < 2e-2
    # padding region zeroed
    assert np.abs(out[1, 48:]).max() == 0.0


def test_fbank_tone_peak():
    # 1 kHz tone must peak at the mel bin containing 1 kHz
    sr = 16000
    t = np.arange(sr) / sr
    wav = (np.sin(2 * np.pi * 1000 * t) * 10000).astype(np.float32)
    feats = fbank_numpy(wav, num_mel_bins=40)
    peak_bin = feats.mean(axis=0).argmax()
    # mel bin centers: bin k center at mel_low + (k+1) * delta
    from espresso_tpu.features.fbank import mel_scale

    mel_low, mel_high = mel_scale(20.0), mel_scale(8000.0)
    delta = (mel_high - mel_low) / 41
    center_mel = mel_low + (peak_bin + 1) * delta
    center_freq = 700.0 * (np.exp(center_mel / 1127.0) - 1.0)
    assert abs(center_freq - 1000.0) < 150.0


def test_mfcc_shape():
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(8000) * 1000).astype(np.float32)
    feats = mfcc_numpy(wav, num_mel_bins=23, num_ceps=13)
    assert feats.shape == (48, 13)
    assert np.isfinite(feats).all()


def test_utterance_cmvn():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 10, 4)).astype(np.float32) * 3 + 1)
    lengths = jnp.asarray([10, 6])
    out = utterance_cmvn(x, lengths, norm_means=True, norm_vars=True)
    out = np.asarray(out)
    m0 = out[0].mean(axis=0)
    assert np.abs(m0).max() < 1e-5
    assert np.abs(out[0].std(axis=0) - 1.0).max() < 1e-4
    # padded frames zero
    assert np.abs(out[1, 6:]).max() == 0.0


def test_global_cmvn_stats():
    rng = np.random.default_rng(0)
    mats = [rng.standard_normal((20, 4)).astype(np.float32) for _ in range(5)]
    stats = compute_global_cmvn_stats(iter(mats))
    allm = np.concatenate(mats)
    assert np.allclose(stats["mean"], allm.mean(0), atol=1e-5)
    assert np.allclose(stats["std"], allm.std(0), atol=1e-4)


def test_specaugment_masks():
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.abs(rng.standard_normal((4, 50, 20))).astype(np.float32) + 1.0)
    lengths = jnp.asarray([50, 40, 30, 20])
    cfg = SpecAugmentConfig(
        freq_mask_width=5, num_freq_masks=2, time_mask_width=10, num_time_masks=2
    )
    out = np.asarray(apply_specaugment(x, lengths, jax.random.PRNGKey(0), cfg))
    assert out.shape == x.shape
    assert (out == 0).sum() > 0  # something masked
    assert (out == 0).mean() < 0.9  # not everything


def test_specaugment_config_string():
    cfg = SpecAugmentConfig.from_string(
        "{'W': 80, 'F': 27, 'T': 100, 'num_freq_masks': 2, 'num_time_masks': 2, 'p': 1.0}"
    )
    assert cfg.time_warp_w == 80 and cfg.freq_mask_width == 27
    cfg2 = SpecAugmentConfig.from_string(
        "{'F': 27, 'time_mask_pm': 0.04, 'time_mask_ps': 0.05, 'num_freq_masks': 2}"
    )
    assert cfg2.time_mask_pm == 0.04


def test_adaptive_specaugment_runs():
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.ones((2, 100, 16), np.float32))
    lengths = jnp.asarray([100, 50])
    cfg = SpecAugmentConfig(
        num_freq_masks=1, freq_mask_width=4, time_mask_pm=0.05, time_mask_ps=0.05
    )
    out = np.asarray(apply_specaugment(x, lengths, jax.random.PRNGKey(1), cfg))
    assert out.shape == x.shape


def test_time_warp_runs():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 60, 8)).astype(np.float32))
    lengths = jnp.asarray([60, 40])
    cfg = SpecAugmentConfig(
        num_freq_masks=0, num_time_masks=0, time_warp_w=5
    )
    out = np.asarray(apply_specaugment(x, lengths, jax.random.PRNGKey(2), cfg))
    assert out.shape == x.shape
    assert np.isfinite(out).all()


def test_fbank_fused_matches_oracle():
    from espresso_tpu.features.pallas_fbank import fbank_fused

    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(32000) * 1000).astype(np.float32)
    batch = np.stack([wav, np.pad(wav[:16000], (0, 16000))])
    ref0 = fbank_numpy(wav)
    ref1 = fbank_numpy(wav[:16000])
    out, lens = fbank_fused(jnp.asarray(batch), jnp.asarray([32000, 16000]))
    out = np.asarray(out)
    assert list(np.asarray(lens)) == [198, 98]
    assert np.abs(out[0][: ref0.shape[0]] - ref0).max() < 2e-2
    assert np.abs(out[1][: ref1.shape[0]] - ref1).max() < 2e-2
    assert np.abs(out[1][98:]).max() == 0.0


def test_fbank_pallas_kernel_matches_oracle_interpret():
    from espresso_tpu.features.pallas_fbank import fbank_pallas

    rng = np.random.default_rng(1)
    wav = (rng.standard_normal(24000) * 500).astype(np.float32)
    ref = fbank_numpy(wav)
    out, lens = fbank_pallas(
        jnp.asarray(wav[None]), jnp.asarray([24000]), interpret=True
    )
    out = np.asarray(out)
    assert int(lens[0]) == ref.shape[0]
    assert np.abs(out[0][: ref.shape[0]] - ref).max() < 2e-2
