"""RTVC-style voice encoder: 40-mel partials -> 3-layer LSTM -> 256-d speaker
embedding (reference: models/voice_encoder/voice_encoder.py:119-274).

TPU design: the input-to-hidden projections of every LSTM layer are hoisted
out of the recurrence into one big (B*T, 40/256) @ (.., 4H) matmul that the
MXU executes in a single pass; only the small (B, H) @ (H, 4H) recurrent
matmul lives inside the lax.scan. Partials are batched along B, so one scan
embeds every window of the utterance at once.
"""
from __future__ import annotations

import functools
import math
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VoiceEncConfig
from ..ops import mel as mel_ops
from ..ops import resample as resample_ops
from . import layers as L


def init(key, cfg: VoiceEncConfig = VoiceEncConfig()):
    keys = L.split_keys(key, 8)
    params = {"lstm": [], "proj": L.linear_init(keys[0], cfg.ve_hidden_size,
                                                cfg.speaker_embed_size)}
    d_in = cfg.num_mels
    for i in range(3):
        k1, k2, k3, k4 = L.split_keys(keys[i + 1], 4)
        h = cfg.ve_hidden_size
        bound = 1.0 / math.sqrt(h)
        params["lstm"].append({
            "wi": L.uniform_(k1, (d_in, 4 * h), bound),
            "wh": L.uniform_(k2, (h, 4 * h), bound),
            "bi": L.uniform_(k3, (4 * h,), bound),
            "bh": L.uniform_(k4, (4 * h,), bound),
        })
        d_in = h
    return params


def _lstm_layer(p, x):
    """x: (B, T, D) -> outputs (B, T, H), final hidden (B, H).

    Gate order i, f, g, o (torch convention, so converted weights drop in).
    """
    h_dim = p["wh"].shape[0]
    b = x.shape[0]
    # hoist the input projection out of the recurrence: one MXU pass
    xi = x @ p["wi"] + (p["bi"] + p["bh"])  # (B, T, 4H)

    def step(carry, xt):
        h, c = carry
        gates = xt + h @ p["wh"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init_carry = (jnp.zeros((b, h_dim), x.dtype), jnp.zeros((b, h_dim), x.dtype))
    (h_final, _), hs = jax.lax.scan(step, init_carry, jnp.swapaxes(xi, 0, 1))
    return jnp.swapaxes(hs, 0, 1), h_final


@functools.partial(jax.jit, static_argnames=("cfg",))
def forward(params, mels: jnp.ndarray, cfg: VoiceEncConfig = VoiceEncConfig()):
    """mels: (B, T=160, M=40) unscaled mel partials -> (B, 256) L2-normed.
    Jitted: the scan + projections compile to one program per partial count."""
    x = mels.astype(jnp.float32)
    h_last = None
    for layer in params["lstm"]:
        x, h_last = _lstm_layer(layer, x)
    emb = L.linear(params["proj"], h_last)
    if cfg.ve_final_relu:
        emb = jax.nn.relu(emb)
    return emb / jnp.linalg.norm(emb, axis=1, keepdims=True)


# ---------------------------------------------------------------------------
# utterance-level embedding (partials -> mean -> L2 norm)
# ---------------------------------------------------------------------------

def _frame_step(cfg: VoiceEncConfig, overlap=0.5, rate: float | None = None) -> int:
    if rate is None:
        return int(round(cfg.ve_partial_frames * (1 - overlap)))
    return int(round((cfg.sample_rate / rate) / cfg.ve_partial_frames))


def _num_wins(n_frames: int, step: int, min_coverage: float, cfg: VoiceEncConfig):
    win = cfg.ve_partial_frames
    n_wins, rem = divmod(max(n_frames - win + step, 0), step)
    if n_wins == 0 or (rem + (win - step)) / win >= min_coverage:
        n_wins += 1
    return n_wins, win + step * (n_wins - 1)


def embed_utterance(params, mel_tm: jnp.ndarray, cfg: VoiceEncConfig = VoiceEncConfig(),
                    overlap=0.5, rate: float | None = 1.3, min_coverage=0.8):
    """mel_tm: (T, M) unscaled mel of one utterance -> (256,) np.float32."""
    step = _frame_step(cfg, overlap, rate)
    n_frames = int(mel_tm.shape[0])
    n_wins, target = _num_wins(n_frames, step, min_coverage, cfg)
    mel = jnp.asarray(mel_tm, jnp.float32)
    if target > n_frames:
        mel = jnp.pad(mel, ((0, target - n_frames), (0, 0)))
    else:
        mel = mel[:target]
    starts = np.arange(n_wins) * step
    idx = starts[:, None] + np.arange(cfg.ve_partial_frames)[None, :]
    partials = mel[idx]                                  # (N, 160, 40)
    embeds = forward(params, partials, cfg)              # (N, 256)
    spk = jnp.mean(embeds, axis=0)
    return spk / jnp.linalg.norm(spk)


def embeds_from_wavs(params, wavs: List[np.ndarray], sample_rate: int,
                     cfg: VoiceEncConfig = VoiceEncConfig(), trim_top_db: float = 20.0,
                     rate: float = 1.3) -> np.ndarray:
    """Utterance embeddings, one per wav (reference: voice_encoder.py:246-274).

    Resampling uses the shared polyphase sinc resampler; silence trimming
    follows librosa.effects.trim(top_db=20) semantics.
    """
    out = []
    for w in wavs:
        w = np.asarray(w, np.float32)
        if sample_rate != cfg.sample_rate:
            w = np.asarray(resample_ops.resample(jnp.asarray(w), sample_rate, cfg.sample_rate))
        if trim_top_db is not None:
            w = trim_silence(w, top_db=trim_top_db)
        mel = mel_ops.melspectrogram_ve(jnp.asarray(w)).T   # (T, 40)
        out.append(np.asarray(embed_utterance(params, mel, cfg, rate=rate)))
    return np.stack(out)


def trim_silence(wav: np.ndarray, top_db: float = 20.0, frame_length: int = 2048,
                 hop_length: int = 512) -> np.ndarray:
    """librosa.effects.trim-equivalent leading/trailing silence removal."""
    if wav.shape[0] < frame_length:
        return wav
    n = 1 + (wav.shape[0] - frame_length) // hop_length
    idx = np.arange(n)[:, None] * hop_length + np.arange(frame_length)[None, :]
    rms = np.sqrt(np.mean(np.square(wav[idx]), axis=1))
    ref = rms.max()
    if ref <= 0:
        return wav
    keep = 20.0 * np.log10(np.maximum(rms, 1e-10) / ref) > -top_db
    if not keep.any():
        return wav[:0]
    first, last = np.argmax(keep), n - 1 - np.argmax(keep[::-1])
    start = first * hop_length
    end = min(wav.shape[0], last * hop_length + frame_length)
    return wav[start:end]
