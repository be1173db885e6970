"""Mel filterbanks and the three mel front-ends used by the pipeline.

The filterbank construction reproduces librosa.filters.mel (slaney scale,
slaney area-norm) in pure numpy so converted checkpoints see identical
features without a librosa dependency. Each front-end is a jit-friendly
function of the waveform (reference: models/s3gen/utils/mel.py:33-80 for the
24 kHz mel, models/s3tokenizer/s3tokenizer.py:128-168 for the tokenizer
log-mel, models/voice_encoder/melspec.py:26-64 for the 40-mel VE front-end).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import stft as stft_ops


# ---------------------------------------------------------------------------
# librosa-compatible mel filterbank (slaney scale + norm)
# ---------------------------------------------------------------------------

def _hz_to_mel_slaney(f):
    f = np.asarray(f, np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mels = np.where(log_region, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz_slaney(m):
    m = np.asarray(m, np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = m >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=16)
def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float = 0.0,
                   fmax: float | None = None) -> np.ndarray:
    """(n_mels, n_fft//2+1) float32 filterbank, identical to librosa defaults."""
    fmax = fmax if fmax is not None else sr / 2.0
    n_freq = n_fft // 2 + 1
    fftfreqs = np.linspace(0.0, sr / 2.0, n_freq)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2)
    mel_f = _mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1][:, None]
    upper = ramps[2:] / fdiff[1:][:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2: n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# 24 kHz mel for S3Gen prompt features & vocoder input
# ---------------------------------------------------------------------------

def mel_spectrogram_24k(y: jnp.ndarray, n_fft: int = 1920, num_mels: int = 80,
                        sampling_rate: int = 24_000, hop_size: int = 480,
                        win_size: int = 1920, fmin: float = 0.0,
                        fmax: float = 8000.0) -> jnp.ndarray:
    """Matcha-style mel: manual reflect pad, center=False, log-compressed.

    Args:   y (B, T) in [-1, 1].
    Returns (B, num_mels, T // hop_size) for T a hop multiple.
    """
    pad = (n_fft - hop_size) // 2
    y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")
    real, imag = stft_ops.stft(y, n_fft, hop_size, stft_ops.hann_window(win_size),
                               win_length=win_size, center=False)
    spec = stft_ops.magnitude(real, imag, eps=1e-9)
    fb = jnp.asarray(mel_filterbank(sampling_rate, n_fft, num_mels, fmin, fmax))
    mel = jnp.matmul(fb, spec, precision=jax.lax.Precision.HIGHEST)
    return jnp.log(jnp.clip(mel, min=1e-5))


# ---------------------------------------------------------------------------
# 16 kHz 128-bin log-mel for the S3 speech tokenizer
# ---------------------------------------------------------------------------

def log_mel_s3tokenizer(audio: jnp.ndarray, n_fft: int = 400, hop: int = 160,
                        n_mels: int = 128) -> jnp.ndarray:
    """Whisper-style log-mel: power spectrum, log10, 8-dB dynamic floor.

    Args:   audio (B, T) at 16 kHz.
    Returns (B, n_mels, n_frames) where the trailing STFT frame is dropped.
    """
    real, imag = stft_ops.stft(audio, n_fft, hop, stft_ops.hann_window(n_fft))
    power = (real * real + imag * imag)[..., :-1]   # drop last frame like whisper
    fb = jnp.asarray(mel_filterbank(16_000, n_fft, n_mels))
    mel = jnp.matmul(fb, power, precision=jax.lax.Precision.HIGHEST)
    log_spec = jnp.log10(jnp.clip(mel, min=1e-10))
    floor = jnp.max(log_spec, axis=(-2, -1), keepdims=True) - 8.0
    log_spec = jnp.maximum(log_spec, floor)
    return (log_spec + 4.0) / 4.0


# ---------------------------------------------------------------------------
# 16 kHz 40-bin mel for the RTVC voice encoder
# ---------------------------------------------------------------------------

def melspectrogram_ve(wav: jnp.ndarray, n_fft: int = 400, hop: int = 160,
                      win: int = 400, n_mels: int = 40, fmin: float = 0.0,
                      fmax: float = 8000.0, power: float = 2.0) -> jnp.ndarray:
    """Unscaled amplitude mel in (..., M, T) layout, librosa-stft semantics."""
    real, imag = stft_ops.stft(wav, n_fft, hop, stft_ops.hann_window(win),
                               win_length=win, center=True, pad_mode="reflect")
    mag = stft_ops.magnitude(real, imag)
    if power != 1.0:
        mag = mag ** power
    fb = jnp.asarray(mel_filterbank(16_000, n_fft, n_mels, fmin, fmax))
    return jnp.matmul(fb, mag, precision=jax.lax.Precision.HIGHEST)
