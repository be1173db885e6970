"""DSP front-end parity tests against torch (torch.stft/istft are the ground
truth the reference checkpoints were built with)."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from chatterbox_embed_tpu.ops import stft as stft_ops
from chatterbox_embed_tpu.ops import mel as mel_ops
from chatterbox_embed_tpu.ops import fbank as fbank_ops
from chatterbox_embed_tpu.ops import resample as resample_ops


def test_hann_window_matches_torch():
    for n in (16, 400, 1920):
        ours = stft_ops.hann_window(n)
        ref = torch.hann_window(n).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize("n_fft,hop,center", [(400, 160, True), (1920, 480, False), (16, 4, True)])
def test_stft_matches_torch(rng, n_fft, hop, center):
    t = n_fft * 4
    x = rng.standard_normal(t).astype(np.float32)
    win = stft_ops.hann_window(n_fft)
    real, imag = stft_ops.stft(jnp.asarray(x)[None], n_fft, hop, win, center=center)
    ref = torch.stft(torch.from_numpy(x)[None], n_fft, hop, n_fft,
                     window=torch.from_numpy(win), center=center,
                     pad_mode="reflect", return_complex=True)
    np.testing.assert_allclose(np.asarray(real[0]), ref[0].real.numpy(), atol=2e-3, rtol=3e-4)
    np.testing.assert_allclose(np.asarray(imag[0]), ref[0].imag.numpy(), atol=2e-3, rtol=3e-4)


def test_istft_matches_torch(rng):
    # the vocoder's tiny iSTFT: n_fft 16, hop 4
    n_fft, hop = 16, 4
    n_frames = 64
    mag = rng.random((1, 9, n_frames)).astype(np.float32) + 0.1
    phase = rng.random((1, 9, n_frames)).astype(np.float32) * 2 * np.pi
    real = mag * np.cos(phase)
    imag = mag * np.sin(phase)
    win = stft_ops.hann_window(n_fft)
    ours = stft_ops.istft(jnp.asarray(real), jnp.asarray(imag), n_fft, hop, win)
    ref = torch.istft(torch.complex(torch.from_numpy(real), torch.from_numpy(imag)),
                      n_fft, hop, n_fft, window=torch.from_numpy(win))
    np.testing.assert_allclose(np.asarray(ours[0]), ref[0].numpy(), atol=1e-4)


def test_stft_istft_roundtrip(rng):
    x = rng.standard_normal(4000).astype(np.float32)
    win = stft_ops.hann_window(400)
    real, imag = stft_ops.stft(jnp.asarray(x)[None], 400, 160, win)
    y = stft_ops.istft(real, imag, 400, 160, win, length=4000)
    np.testing.assert_allclose(np.asarray(y[0]), x, atol=1e-4)


def test_mel_filterbank_slaney_properties():
    fb = mel_ops.mel_filterbank(24_000, 1920, 80, 0.0, 8000.0)
    assert fb.shape == (80, 961)
    # every filter has positive mass, and adjacent filters overlap
    assert (fb.sum(axis=1) > 0).all()
    # slaney norm: peak amplitude decreases with bandwidth (roughly monotone sum)
    assert fb.max() < 0.1


def test_mel24k_shape_and_determinism(rng):
    t = 480 * 50  # 50 mel frames
    y = (rng.standard_normal(t) * 0.1).astype(np.float32)
    m1 = mel_ops.mel_spectrogram_24k(jnp.asarray(y)[None])
    m2 = mel_ops.mel_spectrogram_24k(jnp.asarray(y)[None])
    assert m1.shape == (1, 80, 50)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    assert np.isfinite(np.asarray(m1)).all()


def test_log_mel_s3tokenizer_range(rng):
    t = 16_000  # 1 s -> 100 frames
    y = (rng.standard_normal(t) * 0.1).astype(np.float32)
    m = mel_ops.log_mel_s3tokenizer(jnp.asarray(y)[None])
    assert m.shape == (1, 128, 100)
    m = np.asarray(m)
    # whisper normalisation bounds: (log10 clamped to max-8, then +4 /4)
    assert m.max() <= (np.log10(np.finfo(np.float32).max) + 4) / 4
    assert m.max() - m.min() <= 8.0 / 4.0 + 1e-5


def test_melspectrogram_ve_shape(rng):
    y = (rng.standard_normal(16_000) * 0.1).astype(np.float32)
    m = mel_ops.melspectrogram_ve(jnp.asarray(y))
    # librosa center=True: 1 + T // hop frames
    assert m.shape == (40, 1 + 16_000 // 160)


def test_kaldi_fbank_shape_and_finite(rng):
    y = (rng.standard_normal(16_000) * 0.1).astype(np.float32)
    f = fbank_ops.kaldi_fbank(jnp.asarray(y))
    assert f.shape == (1 + (16_000 - 400) // 160, 80)
    assert np.isfinite(np.asarray(f)).all()


def test_resample_pure_tone(rng):
    # a 440 Hz tone resampled 24k -> 16k must stay a 440 Hz tone
    sr1, sr2 = 24_000, 16_000
    t = np.arange(sr1) / sr1
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    y = np.asarray(resample_ops.resample(jnp.asarray(x), sr1, sr2))
    assert y.shape[-1] == sr2
    t2 = np.arange(sr2) / sr2
    expect = np.sin(2 * np.pi * 440.0 * t2).astype(np.float32)
    # ignore filter edge effects
    np.testing.assert_allclose(y[500:-500], expect[500:-500], atol=5e-3)


def test_resample_matches_length_formula(rng):
    for t in (16_000, 16_001, 24_000, 12_345):
        x = rng.standard_normal(t).astype(np.float32)
        y = resample_ops.resample(jnp.asarray(x), 24_000, 16_000)
        assert y.shape[-1] == int(np.ceil(t * 16_000 / 24_000))
