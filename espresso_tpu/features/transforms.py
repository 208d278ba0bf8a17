"""Feature and waveform transforms.

Rebuild of the fairseq transform registries the reference wires through
``--feature-transforms`` / waveform_transforms:
  * delta_deltas (fairseq/data/audio/feature_transforms/delta_deltas.py) —
    first/second-order regression deltas appended to features (jnp, device)
  * utterance/global CMVN live in features/cmvn.py
  * speed perturbation (waveform_transforms/speedperturb) — host-side linear
    resampling with per-(seed,epoch,index) rate choice
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def delta_deltas(features: jnp.ndarray, win: int = 2) -> jnp.ndarray:
    """Append delta and delta-delta coefficients: [..., T, F] -> [..., T, 3F].

    Kaldi-style regression deltas with window ``win`` and edge replication.
    """
    denom = 2.0 * sum(i * i for i in range(1, win + 1))

    def delta(x):
        pads = [(0, 0)] * (x.ndim - 2) + [(win, win), (0, 0)]
        xp = jnp.pad(x, pads, mode="edge")
        T = x.shape[-2]
        out = jnp.zeros_like(x)
        for i in range(1, win + 1):
            plus = jnp.take(xp, jnp.arange(T) + win + i, axis=-2)
            minus = jnp.take(xp, jnp.arange(T) + win - i, axis=-2)
            out = out + i * (plus - minus)
        return out / denom

    d1 = delta(features)
    d2 = delta(d1)
    return jnp.concatenate([features, d1, d2], axis=-1)


def speed_perturb(
    waveform: np.ndarray,
    rate: float,
) -> np.ndarray:
    """Resample a waveform by ``rate`` (>1 = faster/shorter) with linear
    interpolation (host-side; the reference uses sox via torchaudio)."""
    if rate == 1.0:
        return waveform
    n_out = int(round(len(waveform) / rate))
    src = np.linspace(0.0, len(waveform) - 1, n_out)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, len(waveform) - 1)
    frac = (src - lo).astype(np.float32)
    return (
        waveform[lo] * (1.0 - frac) + waveform[hi] * frac
    ).astype(np.float32)


def choose_speed_rate(
    rates: Sequence[float], seed: int, epoch: int, index: int
) -> float:
    """Per-(seed, epoch, index) deterministic rate choice (reference
    transform seeding, feat_text_dataset.py:151-153)."""
    rng = np.random.default_rng([seed, epoch, index])
    return float(rates[rng.integers(0, len(rates))])
