"""Polyphase windowed-sinc resampling as a strided convolution.

Equivalent to torchaudio.transforms.Resample (sinc_interp_hann,
lowpass_filter_width=6, rolloff=0.99), which the reference uses for all
sample-rate conversion (reference: models/s3gen/s3gen.py:42-44). Expressed as
one lax.conv_general_dilated so XLA maps it onto the MXU; kernels are cached
per (orig, new) pair at trace time.
"""
from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=64)
def _sinc_kernel(orig_freq: int, new_freq: int, lowpass_filter_width: int = 6,
                 rolloff: float = 0.99) -> tuple[np.ndarray, int]:
    """Returns (kernel (new, 1, 2*width + orig), width)."""
    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)
    idx = np.arange(-width, width + orig_freq, dtype=np.float64)[None, :] / orig_freq
    t = (-np.arange(new_freq, dtype=np.float64) / new_freq)[:, None] + idx
    t *= base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    tpi = t * np.pi
    kernel = np.where(tpi == 0, 1.0, np.sin(tpi) / np.where(tpi == 0, 1.0, tpi))
    kernel *= window * base_freq / orig_freq
    return kernel[:, None, :].astype(np.float32), width


def resample(wav: jnp.ndarray, orig_sr: int, new_sr: int,
             lowpass_filter_width: int = 6, rolloff: float = 0.99) -> jnp.ndarray:
    """Resample (..., T) -> (..., ceil(T * new / orig))."""
    if orig_sr == new_sr:
        return wav
    g = math.gcd(int(orig_sr), int(new_sr))
    orig, new = int(orig_sr) // g, int(new_sr) // g
    kernel_np, width = _sinc_kernel(orig, new, lowpass_filter_width, rolloff)

    shape = wav.shape
    t = shape[-1]
    x = wav.reshape(-1, 1, t).astype(jnp.float32)
    out = jax.lax.conv_general_dilated(
        x, jnp.asarray(kernel_np),
        window_strides=(orig,),
        padding=[(width, width + orig)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, new, n_blocks)
    out = jnp.swapaxes(out, -1, -2).reshape(x.shape[0], -1)
    target_len = int(math.ceil(new * t / orig))
    return out[:, :target_len].reshape(shape[:-1] + (target_len,))
