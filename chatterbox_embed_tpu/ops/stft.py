"""STFT / iSTFT as MXU-friendly matmuls.

On TPU the FFT unit is not the fast path for the short transforms used in
speech front-ends (n_fft 400/1920) or the vocoder's tiny iSTFT (n_fft 16).
Instead we express the DFT as a dense matmul against a cos/sin basis: framing
is a strided gather, the transform itself is a single (frames x n_fft) @
(n_fft x 2*freq) matmul that XLA tiles straight onto the MXU, and everything
fuses with the surrounding mel projection.

Semantics match torch.stft / librosa.stft (center, reflect padding,
window handling) so converted checkpoints see identical features
(reference front-ends: models/s3gen/utils/mel.py:60-80,
models/s3tokenizer/s3tokenizer.py:128-168, models/voice_encoder/melspec.py:54-66,
models/s3gen/hifigan.py:396-410).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def hann_window(n: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window, identical to torch.hann_window / scipy fftbins=True."""
    if n == 1:
        return np.ones(1, dtype)
    k = np.arange(n)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)).astype(dtype)


@functools.lru_cache(maxsize=32)
def _dft_basis(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Forward rDFT basis: (n_fft, n_freq) cos and -sin matrices."""
    n_freq = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_freq)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def frame(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """Slice (..., T) into overlapping frames (..., n_frames, frame_length)."""
    t = x.shape[-1]
    n_frames = 1 + (t - frame_length) // hop
    # gather via dynamic strided reshape: indices (n_frames, frame_length)
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :])
    return x[..., idx]


def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: jnp.ndarray | np.ndarray,
    win_length: int | None = None,
    center: bool = True,
    pad_mode: str = "reflect",
):
    """Matmul STFT.

    Args:
      x: (..., T) waveform.
      window: (win_length,) analysis window.
    Returns:
      (real, imag), each (..., n_freq, n_frames) float32.
    """
    win_length = win_length or n_fft
    window = jnp.asarray(window, jnp.float32)
    if win_length < n_fft:  # torch pads the window symmetrically to n_fft
        lp = (n_fft - win_length) // 2
        window = jnp.pad(window, (lp, n_fft - win_length - lp))
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode=pad_mode)
    frames = frame(x.astype(jnp.float32), n_fft, hop_length) * window
    cos_b, msin_b = _dft_basis(n_fft)
    # full fp32 accumulation: feature parity with the torch reference matters
    # more than the (negligible) front-end FLOPs
    dot = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    real = dot(frames, jnp.asarray(cos_b))
    imag = dot(frames, jnp.asarray(msin_b))
    # -> (..., n_freq, n_frames)
    return jnp.swapaxes(real, -1, -2), jnp.swapaxes(imag, -1, -2)


def magnitude(real: jnp.ndarray, imag: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    return jnp.sqrt(real * real + imag * imag + eps)


@functools.lru_cache(maxsize=8)
def _idft_basis(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse rDFT basis (n_freq, n_fft): x = real @ C + imag @ S.

    Hermitian symmetry folded in: interior bins count double.
    """
    n_freq = n_fft // 2 + 1
    k = np.arange(n_freq)[:, None]
    n = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    w = np.full((n_freq, 1), 2.0 / n_fft)
    w[0] = 1.0 / n_fft
    if n_fft % 2 == 0:
        w[-1] = 1.0 / n_fft
    return (np.cos(ang) * w).astype(np.float32), (-np.sin(ang) * w).astype(np.float32)


@functools.lru_cache(maxsize=32)
def _nola_denominator_cached(win_bytes: bytes, n_fft: int, hop: int,
                             n_frames: int) -> np.ndarray:
    win2 = np.frombuffer(win_bytes, np.float32).astype(np.float64) ** 2
    out_len = n_fft + hop * (n_frames - 1)
    imp = np.zeros(out_len - n_fft + 1, np.float64)
    imp[:: hop] = 1.0
    return np.convolve(imp, win2, mode="full")[:out_len].astype(np.float32)


def _nola_denominator(window, n_fft: int, hop: int, n_frames: int) -> np.ndarray:
    """Sum of squared windows over overlapped frames, (out_len,).

    Requires a CONCRETE window (numpy) — all front-ends pass hann_window()."""
    win = np.asarray(window, np.float32)
    return _nola_denominator_cached(win.tobytes(), n_fft, hop, n_frames)


def istft(
    real: jnp.ndarray,
    imag: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    window: jnp.ndarray | np.ndarray,
    center: bool = True,
    length: int | None = None,
) -> jnp.ndarray:
    """Inverse STFT with overlap-add, matching torch.istft (NOLA-normalised).

    Args:
      real, imag: (..., n_freq, n_frames). `window` must be concrete (numpy).
    Returns:
      (..., T) waveform.
    """
    window_np = np.asarray(window, np.float32)
    window = jnp.asarray(window_np)
    cos_b, msin_b = _idft_basis(n_fft)
    # frames: (..., n_frames, n_fft)
    spec_r = jnp.swapaxes(real, -1, -2)
    spec_i = jnp.swapaxes(imag, -1, -2)
    dot = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    frames = dot(spec_r, jnp.asarray(cos_b)) + dot(spec_i, jnp.asarray(msin_b))
    frames = frames * window

    n_frames = frames.shape[-2]
    out_len = n_fft + hop_length * (n_frames - 1)

    # Overlap-add as a transposed convolution with an identity kernel:
    # out[t'*hop + k] += frames[t', k]. A scatter-add would serialise on TPU.
    # anti-diagonal: XLA conv is a correlation, so the kernel tap for frame
    # channel f must sit at position n_fft-1-f to land at output t'*hop + f
    eye = np.zeros((n_fft, 1, n_fft), np.float32)
    eye[n_fft - 1 - np.arange(n_fft), 0, np.arange(n_fft)] = 1.0

    def ola(fr):
        lead = fr.shape[:-2]
        y = jax.lax.conv_general_dilated(
            fr.reshape((-1,) + fr.shape[-2:]), jnp.asarray(eye),
            window_strides=(1,), padding=[(n_fft - 1, n_fft - 1)],
            lhs_dilation=(hop_length,),
            dimension_numbers=("NWC", "WOI", "NWC"))
        return y[..., 0].reshape(lead + (y.shape[1],))

    sig = ola(frames)
    # the NOLA denominator is deterministic: build it host-side (cached) so
    # XLA does not constant-fold a megasample conv at compile time
    wsq = jnp.asarray(_nola_denominator(window_np, n_fft, hop_length, n_frames))
    sig = sig / jnp.maximum(wsq, 1e-11)
    if center:
        sig = sig[..., n_fft // 2: out_len - n_fft // 2]
    if length is not None:
        sig = sig[..., :length]
    return sig
