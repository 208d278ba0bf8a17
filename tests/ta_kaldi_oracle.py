"""Test-only torch port of torchaudio.compliance.kaldi fbank/mfcc.

The reference feature path is espresso/tools/utils.py:426-455 ->
torchaudio.compliance.kaldi.{fbank,mfcc}. torchaudio is not installable in
this environment, so this module re-derives the exact float32 op sequence
(framing, dither, DC removal, replicate-padded pre-emphasis, povey window,
power-of-two zero padding, rFFT power spectrum, Kaldi mel banks with a zero
Nyquist column, eps-floored natural log, orthonormal DCT + cepstral lifter)
with torch ops in the same order and dtype as torchaudio's implementation.
Used ONLY to generate/check golden feature tensors (tests/data/*.npz); the
framework's own implementations live in espresso_tpu/features/fbank.py.
"""

from __future__ import annotations

import math

import torch

EPSILON = 1.1920928955078125e-07  # torch.finfo(torch.float).eps


def _next_power_of_2(x: int) -> int:
    return 1 if x == 0 else 2 ** (x - 1).bit_length()


def _get_strided(waveform, window_size, window_shift):
    # snip_edges framing (kaldi feature-window.cc:42)
    num_samples = waveform.size(0)
    if num_samples < window_size:
        return torch.empty((0, window_size), dtype=waveform.dtype)
    m = 1 + (num_samples - window_size) // window_shift
    strides = (window_shift * waveform.stride(0), waveform.stride(0))
    return waveform.as_strided((m, window_size), strides)


def _povey_window(window_size: int) -> torch.Tensor:
    return torch.hann_window(
        window_size, periodic=False, dtype=torch.float32
    ).pow(0.85)


def _get_window(
    waveform,
    padded_window_size,
    window_size,
    window_shift,
    remove_dc_offset=True,
    preemphasis_coefficient=0.97,
    dither=0.0,
):
    strided = _get_strided(waveform, window_size, window_shift)
    if dither != 0.0:
        strided = strided + dither * torch.randn(strided.shape)
    if remove_dc_offset:
        strided = strided - torch.mean(strided, dim=1).unsqueeze(1)
    if preemphasis_coefficient != 0.0:
        offset_strided = torch.nn.functional.pad(
            strided.unsqueeze(0), (1, 0), mode="replicate"
        ).squeeze(0)
        strided = strided - preemphasis_coefficient * offset_strided[:, :-1]
    strided = strided * _povey_window(window_size).unsqueeze(0)
    if padded_window_size != window_size:
        strided = torch.nn.functional.pad(
            strided.unsqueeze(0),
            (0, padded_window_size - window_size),
            mode="constant",
            value=0.0,
        ).squeeze(0)
    return strided


def _mel_scale(freq):
    if isinstance(freq, torch.Tensor):
        return 1127.0 * (1.0 + freq / 700.0).log()
    return 1127.0 * math.log(1.0 + freq / 700.0)


def get_mel_banks(
    num_bins, window_length_padded, sample_freq, low_freq=20.0, high_freq=0.0
):
    num_fft_bins = window_length_padded // 2
    nyquist = 0.5 * sample_freq
    if high_freq <= 0.0:
        high_freq += nyquist
    fft_bin_width = sample_freq / window_length_padded
    mel_low_freq = _mel_scale(low_freq)
    mel_high_freq = _mel_scale(high_freq)
    mel_freq_delta = (mel_high_freq - mel_low_freq) / (num_bins + 1)
    bin = torch.arange(num_bins).unsqueeze(1)
    left_mel = mel_low_freq + bin * mel_freq_delta
    center_mel = mel_low_freq + (bin + 1.0) * mel_freq_delta
    right_mel = mel_low_freq + (bin + 2.0) * mel_freq_delta
    mel = _mel_scale(fft_bin_width * torch.arange(num_fft_bins)).unsqueeze(0)
    up_slope = (mel - left_mel) / (center_mel - left_mel)
    down_slope = (right_mel - mel) / (right_mel - center_mel)
    return torch.max(
        torch.zeros(1), torch.min(up_slope, down_slope)
    )  # [num_bins, num_fft_bins]


def fbank(
    waveform,
    num_mel_bins=23,
    frame_length=25.0,
    frame_shift=10.0,
    sample_frequency=16000.0,
    low_freq=20.0,
    high_freq=0.0,
    preemphasis_coefficient=0.97,
    remove_dc_offset=True,
    dither=0.0,
    use_power=True,
    use_log_fbank=True,
):
    """[num_samples] float32 -> [T, num_mel_bins] log-mel, torchaudio order."""
    waveform = torch.as_tensor(waveform, dtype=torch.float32).reshape(-1)
    window_shift = int(sample_frequency * frame_shift * 0.001)
    window_size = int(sample_frequency * frame_length * 0.001)
    padded_window_size = _next_power_of_2(window_size)
    strided = _get_window(
        waveform,
        padded_window_size,
        window_size,
        window_shift,
        remove_dc_offset,
        preemphasis_coefficient,
        dither,
    )
    if strided.numel() == 0:
        return torch.empty((0, num_mel_bins))
    spectrum = torch.fft.rfft(strided).abs()
    if use_power:
        spectrum = spectrum.pow(2.0)
    mel_energies = get_mel_banks(
        num_mel_bins, padded_window_size, sample_frequency, low_freq, high_freq
    )
    mel_energies = torch.nn.functional.pad(
        mel_energies, (0, 1), mode="constant", value=0.0
    )
    mel_energies = torch.mm(spectrum, mel_energies.T)
    if use_log_fbank:
        mel_energies = torch.max(
            mel_energies, torch.tensor(EPSILON)
        ).log()
    return mel_energies


def _get_dct_matrix(num_ceps, num_mel_bins):
    # create_dct(norm="ortho") with Kaldi's first-column override
    n = torch.arange(float(num_mel_bins))
    k = torch.arange(float(num_ceps)).unsqueeze(1)
    dct = torch.cos(math.pi / float(num_mel_bins) * (n + 0.5) * k)
    dct[0] *= 1.0 / math.sqrt(2.0)
    dct *= math.sqrt(2.0 / float(num_mel_bins))
    dct = dct.t()  # [num_mel_bins, num_ceps]
    dct[:, 0] = math.sqrt(1.0 / float(num_mel_bins))
    return dct


def _get_lifter_coeffs(num_ceps, cepstral_lifter):
    i = torch.arange(float(num_ceps))
    return 1.0 + 0.5 * cepstral_lifter * torch.sin(
        math.pi * i / cepstral_lifter
    )


def mfcc(
    waveform,
    num_mel_bins=23,
    num_ceps=13,
    frame_length=25.0,
    frame_shift=10.0,
    sample_frequency=16000.0,
    low_freq=20.0,
    high_freq=0.0,
    cepstral_lifter=22.0,
    **kwargs,
):
    """Kaldi-compliance MFCC (espresso operating point uses num_ceps=40,
    low_freq=20, high_freq=-400; espresso/tools/utils.py:443-449)."""
    feature = fbank(
        waveform,
        num_mel_bins=num_mel_bins,
        frame_length=frame_length,
        frame_shift=frame_shift,
        sample_frequency=sample_frequency,
        low_freq=low_freq,
        high_freq=high_freq,
        use_log_fbank=True,
        use_power=True,
        **kwargs,
    )
    dct_matrix = _get_dct_matrix(num_ceps, num_mel_bins)
    feature = feature.matmul(dct_matrix)
    if cepstral_lifter != 0.0:
        feature *= _get_lifter_coeffs(num_ceps, cepstral_lifter).unsqueeze(0)
    return feature
