"""HiFT-GAN vocoder: NSF harmonic source + iSTFT-Net head, mel -> 24 kHz wav
(reference: models/s3gen/hifigan.py:286-474, f0_predictor.py:19-55;
config s3gen.py:273-281).

TPU design: weight-norm is folded into plain convs at conversion; the tiny
n_fft=16 STFT/iSTFT pair is the matmul-DFT from ops.stft (an FFT would waste
the MXU); the harmonic source's cumulative phase is a single jnp.cumsum over
the 24 kHz timeline; all convs are channel-last NWC. Randomness (harmonic
phases + source noise) is threaded through an explicit PRNG key so generation
is reproducible; pass the same key to reproduce a bit-exact waveform.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import HiFTConfig
from . import layers as L
from ..ops import stft as stft_ops


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _resblock_init(nk, channels, kernel, dilations):
    return {
        "convs1": [L.conv1d_init(nk(), kernel, channels, channels) for _ in dilations],
        "convs2": [L.conv1d_init(nk(), kernel, channels, channels) for _ in dilations],
        "alpha1": [np.ones((channels,), np.float32) for _ in dilations],
        "alpha2": [np.ones((channels,), np.float32) for _ in dilations],
    }


def init(key, cfg: HiFTConfig = HiFTConfig()):
    keys = iter(L.split_keys(key, 512))
    nk = lambda: next(keys)
    base = cfg.base_channels
    nfft = cfg.istft_n_fft

    f0p = {"convs": [L.conv1d_init(nk(), 3, cfg.in_channels if i == 0 else cfg.f0_cond_channels,
                                   cfg.f0_cond_channels) for i in range(5)],
           "classifier": L.linear_init(nk(), cfg.f0_cond_channels, 1)}

    ups, source_downs, source_resblocks, resblocks = [], [], [], []
    # downsample rates for the source branch (reference: hifigan.py:353-355)
    down_rates = [1] + list(cfg.upsample_rates[::-1][:-1])
    down_cum = list(np.cumprod(down_rates))[::-1]
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        ch_out = base // (2 ** (i + 1))
        ups.append({"w": L.conv1d_init(nk(), k, ch_out, base // (2 ** i))["w"],
                    "b": np.zeros((ch_out,), np.float32)})
        d = int(down_cum[i])
        if d == 1:
            source_downs.append(L.conv1d_init(nk(), 1, nfft + 2, ch_out))
        else:
            source_downs.append(L.conv1d_init(nk(), d * 2, nfft + 2, ch_out))
        source_resblocks.append(_resblock_init(
            nk, ch_out, cfg.source_resblock_kernel_sizes[i], cfg.source_resblock_dilation_sizes[i]))
        for kk, dd in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            resblocks.append(_resblock_init(nk, ch_out, kk, dd))

    return {
        "f0_predictor": f0p,
        "m_source_linear": L.linear_init(nk(), cfg.nb_harmonics + 1, 1),
        "conv_pre": L.conv1d_init(nk(), 7, cfg.in_channels, base),
        "ups": ups,
        "source_downs": source_downs,
        "source_resblocks": source_resblocks,
        "resblocks": resblocks,
        "conv_post": L.conv1d_init(nk(), 7, base // (2 ** len(cfg.upsample_rates)), nfft + 2),
    }


# ---------------------------------------------------------------------------
# components
# ---------------------------------------------------------------------------

def f0_predict(p, mel: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """mel (B, T, 80) -> f0 (B, T) Hz (reference: f0_predictor.py:19-55)."""
    x = mel.astype(dtype)
    for conv in p["convs"]:
        x = jax.nn.elu(L.conv1d(conv, x, padding=1, dtype=dtype))
    return jnp.abs(L.linear(p["classifier"], x, dtype))[..., 0]


def sine_source(key, f0_up: jnp.ndarray, cfg: HiFTConfig = HiFTConfig()):
    """Harmonic sine source at audio rate (reference: hifigan.py:169-283).

    f0_up: (B, T_audio) upsampled f0. Returns source (B, T_audio).
    """
    b, t = f0_up.shape
    nh = cfg.nb_harmonics + 1
    k_phase, k_noise, k_src_noise = jax.random.split(key, 3)

    harmonics = (jnp.arange(1, nh + 1, dtype=jnp.float32))[None, :, None]
    f_mat = f0_up[:, None, :] * harmonics / cfg.sampling_rate          # (B, 9, T)
    # cumulative phase; fp32 cumsum of (cycles % 1) mirrors the reference
    theta = 2.0 * jnp.pi * (jnp.cumsum(f_mat, axis=-1) % 1.0)
    phase = jax.random.uniform(k_phase, (b, nh, 1), jnp.float32, -jnp.pi, jnp.pi)
    phase = phase.at[:, 0, :].set(0.0)
    sines = cfg.nsf_alpha * jnp.sin(theta + phase)

    uv = (f0_up > cfg.nsf_voiced_threshold).astype(jnp.float32)[:, None, :]
    noise_amp = uv * cfg.nsf_sigma + (1.0 - uv) * cfg.nsf_alpha / 3.0
    noise = noise_amp * jax.random.normal(k_noise, sines.shape, jnp.float32)
    sines = sines * uv + noise                                          # (B, 9, T)
    return sines


def source_module(params, key, f0_up: jnp.ndarray, cfg: HiFTConfig = HiFTConfig()):
    """(B, T_audio) f0 -> merged excitation (B, T_audio)
    (reference: hifigan.py:234-283)."""
    sines = sine_source(key, f0_up, cfg)                # (B, 9, T)
    merged = jnp.tanh(L.linear(params["m_source_linear"], jnp.swapaxes(sines, 1, 2)))
    return merged[..., 0]


def _resblock(p, x, kernel, dilations, dtype):
    for c1, c2, a1, a2, d in zip(p["convs1"], p["convs2"], p["alpha1"], p["alpha2"],
                                 dilations):
        pad1 = (kernel * d - d) // 2
        h = L.snake(x, a1)
        h = L.conv1d(c1, h, padding=pad1, dilation=d, dtype=dtype)
        h = L.snake(h, a2)
        h = L.conv1d(c2, h, padding=(kernel - 1) // 2, dtype=dtype)
        x = x + h
    return x


# ---------------------------------------------------------------------------
# full vocoder
# ---------------------------------------------------------------------------

def decode(params, mel: jnp.ndarray, source: jnp.ndarray,
           cfg: HiFTConfig = HiFTConfig(), dtype=jnp.float32) -> jnp.ndarray:
    """mel (B, T, 80) + source (B, T*480) -> wav (B, T*480)
    (reference: hifigan.py:412-444)."""
    win = stft_ops.hann_window(cfg.istft_n_fft)
    s_re, s_im = stft_ops.stft(source, cfg.istft_n_fft, cfg.istft_hop_len, win)
    s_stft = jnp.concatenate([s_re, s_im], axis=1)       # (B, 18, T')
    s_stft = jnp.swapaxes(s_stft, 1, 2).astype(dtype)    # (B, T', 18)

    x = L.conv1d(params["conv_pre"], mel.astype(dtype), padding=3, dtype=dtype)
    num_kernels = len(cfg.resblock_kernel_sizes)
    down_rates = [1] + list(cfg.upsample_rates[::-1][:-1])
    down_cum = list(np.cumprod(down_rates))[::-1]
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = jax.nn.leaky_relu(x, cfg.lrelu_slope)
        up = params["ups"][i]
        x = L.conv_transpose1d({"w": up["w"], "b": up["b"]}, x, u, (k - u) // 2, dtype=dtype)
        if i == len(cfg.upsample_rates) - 1:
            x = jnp.concatenate([x[:, 1:2], x], axis=1)  # ReflectionPad1d((1, 0))
        d = int(down_cum[i])
        si = L.conv1d(params["source_downs"][i], s_stft,
                      stride=d if d > 1 else 1, padding=d // 2 if d > 1 else 0,
                      dtype=dtype)
        si = _resblock(params["source_resblocks"][i], si,
                       cfg.source_resblock_kernel_sizes[i],
                       cfg.source_resblock_dilation_sizes[i], dtype)
        x = x + si
        acc = None
        for j in range(num_kernels):
            r = _resblock(params["resblocks"][i * num_kernels + j], x,
                          cfg.resblock_kernel_sizes[j],
                          cfg.resblock_dilation_sizes[j], dtype)
            acc = r if acc is None else acc + r
        x = acc / num_kernels
    x = jax.nn.leaky_relu(x, 0.01)
    x = L.conv1d(params["conv_post"], x, padding=3, dtype=dtype).astype(jnp.float32)

    nfreq = cfg.istft_n_fft // 2 + 1
    mag = jnp.exp(jnp.clip(x[..., :nfreq], max=np.log(1e2)))
    phase = jnp.sin(x[..., nfreq:])  # reference applies sin; phase basis below
    real = mag * jnp.cos(phase)
    imag = mag * jnp.sin(phase)
    wav = stft_ops.istft(jnp.swapaxes(real, 1, 2), jnp.swapaxes(imag, 1, 2),
                         cfg.istft_n_fft, cfg.istft_hop_len, win)
    return jnp.clip(wav, -cfg.audio_limit, cfg.audio_limit)


# ---------------------------------------------------------------------------
# windowed streaming synthesis (phase-continuous excitation across windows)
# ---------------------------------------------------------------------------

def _stream_impl(params, mel_win, phase_key, noise_key, phase_carry,
                 carry_idx, cfg: HiFTConfig, dtype):
    b, t, _ = mel_win.shape
    nh = cfg.nb_harmonics + 1
    f0 = f0_predict(params["f0_predictor"], mel_win, dtype)
    f0_up = jnp.repeat(f0, cfg.total_upsample, axis=-1)          # (B, T*480)
    harmonics = jnp.arange(1, nh + 1, dtype=jnp.float32)[None, :, None]
    f_mat = f0_up[:, None, :] * harmonics / cfg.sampling_rate
    rad = phase_carry[:, :, None] + jnp.cumsum(f_mat, axis=-1)
    carry_next = jax.lax.dynamic_index_in_dim(rad, carry_idx, axis=2,
                                              keepdims=False) % 1.0
    theta = 2.0 * jnp.pi * (rad % 1.0)
    # harmonic phases from the utterance-stable key; per-window noise
    phase = jax.random.uniform(phase_key, (b, nh, 1), jnp.float32, -jnp.pi, jnp.pi)
    phase = phase.at[:, 0, :].set(0.0)
    sines = cfg.nsf_alpha * jnp.sin(theta + phase)
    uv = (f0_up > cfg.nsf_voiced_threshold).astype(jnp.float32)[:, None, :]
    noise_amp = uv * cfg.nsf_sigma + (1.0 - uv) * cfg.nsf_alpha / 3.0
    sines = sines * uv + noise_amp * jax.random.normal(noise_key, sines.shape,
                                                       jnp.float32)
    merged = jnp.tanh(L.linear(params["m_source_linear"],
                               jnp.swapaxes(sines, 1, 2)))[..., 0]
    wav = decode(params, mel_win, merged, cfg, dtype)
    return wav, carry_next


_stream_jit = jax.jit(_stream_impl, static_argnames=("cfg", "dtype"))


def stream_synthesize(params, mel_win: jnp.ndarray, phase_key, noise_key,
                      phase_carry: jnp.ndarray, carry_idx,
                      cfg: HiFTConfig = HiFTConfig(), dtype=jnp.float32):
    """Synthesize one mel window with a phase-continuous harmonic source.

    mel_win:      (B, M+new, 80) — M already-emitted context frames + new.
    phase_carry:  (B, nb_harmonics+1) cumulative cycles at the window start;
                  pass zeros for the first window.
    carry_idx:    sample index (traced ok) at which to read the next
                  window's carry (= valid_new_frames * total_upsample - 1).
    phase_key:    utterance-stable key (harmonic phases must repeat across
                  windows); noise_key: fold per window.
    Returns (wav (B, (M+new)*480), next phase_carry)."""
    return _stream_jit(params, mel_win, phase_key, noise_key, phase_carry,
                       jnp.asarray(carry_idx, jnp.int32), cfg, dtype)


def _inference_impl(params, mel, key, cache_source,
                    cfg: HiFTConfig, dtype):
    f0 = f0_predict(params["f0_predictor"], mel, dtype)   # (B, T)
    f0_up = jnp.repeat(f0, cfg.total_upsample, axis=-1)   # nearest upsample x480
    s = source_module(params, key, f0_up, cfg)            # (B, T*480)
    if cache_source is not None and cache_source.shape[-1] > 0:
        n = cache_source.shape[-1]
        s = jnp.concatenate([cache_source.astype(s.dtype), s[:, n:]], axis=1)
    wav = decode(params, mel, s, cfg, dtype)
    return wav, s


_inference_jit = jax.jit(_inference_impl, static_argnames=("cfg", "dtype"))
_inference_jit_nocache = jax.jit(
    lambda params, mel, key, cfg, dtype: _inference_impl(params, mel, key, None, cfg, dtype),
    static_argnames=("cfg", "dtype"))


def inference(params, mel: jnp.ndarray, key=None, cache_source: jnp.ndarray | None = None,
              cfg: HiFTConfig = HiFTConfig(), dtype=jnp.float32):
    """mel (B, T, 80) -> (wav (B, T*480), source (B, T*480))
    (reference: hifigan.py:462-474). `cache_source` overwrites the head of the
    regenerated excitation for glitch-free streaming (hifigan.py:470-472).
    Jitted end-to-end."""
    if key is None:
        key = jax.random.PRNGKey(0)
    if cache_source is None:
        return _inference_jit_nocache(params, mel, key, cfg, dtype)
    return _inference_jit(params, mel, key, cache_source, cfg, dtype)
