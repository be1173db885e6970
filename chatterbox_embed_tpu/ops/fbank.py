"""Kaldi-compatible 80-bin log-fbank for the CAMPPlus speaker encoder.

Reproduces torchaudio.compliance.kaldi.fbank(num_mel_bins=80) defaults
(povey window, preemphasis 0.97, DC removal, snip_edges, power spectrum,
HTK mel, log floor at float-eps) as one jit-friendly function
(reference: models/s3gen/xvector.py:45-58 feeds this into CAMPPlus).
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from . import stft as stft_ops

_EPS = 1.1920928955078125e-07  # float32 machine eps, kaldi's log floor


def _mel_htk(f):
    return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)


@functools.lru_cache(maxsize=4)
def kaldi_mel_banks(num_bins: int = 80, window_size_padded: int = 512,
                    sample_freq: float = 16_000.0, low_freq: float = 20.0,
                    high_freq: float = 0.0) -> np.ndarray:
    """(num_bins, window_size_padded // 2) kaldi-style triangular banks."""
    if high_freq <= 0.0:
        high_freq = sample_freq / 2.0 + high_freq
    num_fft_bins = window_size_padded // 2
    fft_bin_width = sample_freq / window_size_padded
    mel_low = _mel_htk(low_freq)
    mel_high = _mel_htk(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bin_idx = np.arange(num_bins)[:, None]
    left_mel = mel_low + bin_idx * mel_delta
    center_mel = left_mel + mel_delta
    right_mel = center_mel + mel_delta

    mel = _mel_htk(fft_bin_width * np.arange(num_fft_bins))[None, :]
    up = (mel - left_mel) / (center_mel - left_mel)
    down = (right_mel - mel) / (right_mel - center_mel)
    banks = np.maximum(0.0, np.minimum(up, down))
    return banks.astype(np.float32)


@functools.lru_cache(maxsize=4)
def _povey_window(n: int) -> np.ndarray:
    k = np.arange(n)
    hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * k / (n - 1))
    return (hann ** 0.85).astype(np.float32)


def kaldi_fbank(wav: jnp.ndarray, num_mel_bins: int = 80,
                sample_freq: int = 16_000, frame_length_ms: float = 25.0,
                frame_shift_ms: float = 10.0, preemphasis: float = 0.97,
                remove_dc_offset: bool = True) -> jnp.ndarray:
    """Args: wav (..., T) float in [-1, 1]. Returns (..., n_frames, num_mel_bins)."""
    win = int(sample_freq * frame_length_ms / 1000.0)   # 400
    hop = int(sample_freq * frame_shift_ms / 1000.0)    # 160
    padded = 1 << (win - 1).bit_length()                 # 512

    frames = stft_ops.frame(wav.astype(jnp.float32), win, hop)  # (..., F, win)
    if remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if preemphasis != 0.0:
        first = frames[..., :1] - preemphasis * frames[..., :1]
        rest = frames[..., 1:] - preemphasis * frames[..., :-1]
        frames = jnp.concatenate([first, rest], axis=-1)
    frames = frames * jnp.asarray(_povey_window(win))
    frames = jnp.pad(frames, [(0, 0)] * (frames.ndim - 1) + [(0, padded - win)])

    import functools
    import jax
    dot = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    cos_b, msin_b = stft_ops._dft_basis(padded)
    # kaldi drops the nyquist bin
    real = dot(frames, jnp.asarray(cos_b[:, :-1]))
    imag = dot(frames, jnp.asarray(msin_b[:, :-1]))
    power = real * real + imag * imag
    banks = jnp.asarray(kaldi_mel_banks(num_mel_bins, padded, float(sample_freq)))
    mel = dot(power, banks.T)
    return jnp.log(jnp.maximum(mel, _EPS))
