"""S3 speech tokenizer v2 (25 Hz): 16 kHz wav -> discrete speech tokens.

The reference delegates to the external `s3tokenizer` pip package
(models/s3tokenizer/s3tokenizer.py:1-12 wraps S3TokenizerV2
"speech_tokenizer_v2_25hz"; quantize() called at s3tokenizer.py:122).
This is a from-scratch JAX implementation of that package's model_v2
architecture (SAN-M style, as used by CosyVoice2's 25 Hz tokenizer):

- frontend: two Conv1d(k=3, stride=2) + GELU over 128-bin log-mels,
  100 Hz mel frames -> 25 Hz token frames (no positional embedding — the
  FSMN memory branch below carries position, per SAN-M);
- encoder: 6 residual blocks of FSMN multi-head attention (20 heads,
  1280-d) — standard softmax attention PLUS a depthwise-conv "memory"
  branch (kernel 31, no bias) over the value projection, added to the
  attention output — followed by a GELU MLP (x4);
- head: FSQ — Linear(1280 -> 8), tanh, scale 0.999..., round to
  {-1,0,1}, +1, base-3 positional encode -> 3**8 = 6561 codes.

TPU design: the transformer runs in bf16 with fp32 softmax/LN; the FSQ
rounding is a pure vector op. All shapes static — callers pad waveforms to
40 ms multiples exactly like the reference's `pad()` helper, and padded
frames are masked before each conv / inside the FSMN branch so token output
is bucket-invariant.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import S3TokenizerConfig, S3_SR, S3_TOKEN_RATE, SPEECH_VOCAB_SIZE
from ..ops import mel as mel_ops
from . import layers as L

# Upstream rounds tanh(z) * this constant (fp32 image of 0.999) before the
# base-3 encode; kept bit-equal so converted checkpoints token-match.
_FSQ_SCALE = 0.9990000128746033


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init(key, cfg: S3TokenizerConfig = S3TokenizerConfig()):
    keys = iter(L.split_keys(key, 16 + 16 * cfg.n_layers))
    nk = lambda: next(keys)
    d = cfg.n_state
    params = {
        "conv1": L.conv1d_init(nk(), 3, cfg.n_mels, d),
        "conv2": L.conv1d_init(nk(), 3, d, d),
        "blocks": [],
        "fsq_proj": L.linear_init(nk(), d, cfg.fsq_dim),
    }
    for _ in range(cfg.n_layers):
        params["blocks"].append({
            "ln1": L.layer_norm_init(d),
            "q": L.linear_init(nk(), d, d),
            "k": L.linear_init(nk(), d, d, bias=False),
            "v": L.linear_init(nk(), d, d),
            "o": L.linear_init(nk(), d, d),
            "fsmn": L.conv1d_init(nk(), cfg.fsmn_kernel, d, d, bias=False,
                                  groups=d),
            "ln2": L.layer_norm_init(d),
            "fc1": L.linear_init(nk(), d, 4 * d),
            "fc2": L.linear_init(nk(), 4 * d, d),
        })
    return params


def _fsmn(p, v, mask_pad, kernel: int, dtype):
    """SAN-M memory branch: depthwise conv (symmetric pad) + residual over the
    value projection, masked on both sides of the conv."""
    x = v * mask_pad
    lo = (kernel - 1) // 2
    y = L.conv1d(p, x, padding=(lo, kernel - 1 - lo), groups=x.shape[-1],
                 dtype=dtype)
    return (y + x) * mask_pad


def _block(p, x, attn_mask, mask_pad, cfg: S3TokenizerConfig, dtype):
    # Upstream asymmetry kept verbatim: attn_ln eps=1e-6, mlp_ln default 1e-5.
    h = L.layer_norm(p["ln1"], x, eps=1e-6)
    q = L.split_heads(L.linear(p["q"], h, dtype), cfg.n_heads)
    k = L.split_heads(L.linear(p["k"], h, dtype), cfg.n_heads)
    v = L.linear(p["v"], h, dtype)
    mem = _fsmn(p["fsmn"], v, mask_pad, cfg.fsmn_kernel, dtype)
    att = L.merge_heads(L.mha(q, k, L.split_heads(v, cfg.n_heads), mask=attn_mask))
    x = x + L.linear(p["o"], att, dtype) + mem
    h = L.layer_norm(p["ln2"], x)
    return x + L.linear(p["fc2"], jax.nn.gelu(L.linear(p["fc1"], h, dtype),
                                              approximate=False), dtype)


def encode(params, mels: jnp.ndarray, mel_lens: jnp.ndarray,
           cfg: S3TokenizerConfig = S3TokenizerConfig(), dtype=jnp.float32):
    """mels (B, n_mels, T@100Hz) -> hidden (B, ceil(T/4), n_state), token lens.

    Padded frames are zeroed before each strided conv (kernel 3 reads one
    frame across the length boundary) so outputs are padding-invariant.
    """
    x = jnp.swapaxes(mels, 1, 2).astype(dtype)              # (B, T, 128)
    t0 = x.shape[1]
    x = x * (jnp.arange(t0)[None, :, None] < mel_lens[:, None, None])
    x = jax.nn.gelu(L.conv1d(params["conv1"], x, stride=2, padding=1, dtype=dtype))
    l1 = (mel_lens + 1) // 2
    x = x * (jnp.arange(x.shape[1])[None, :, None] < l1[:, None, None])
    x = jax.nn.gelu(L.conv1d(params["conv2"], x, stride=2, padding=1, dtype=dtype))
    tok_lens = (l1 + 1) // 2
    t = x.shape[1]
    pad_mask = (jnp.arange(t)[None, :] < tok_lens[:, None])   # (B, T)
    attn_mask = pad_mask[:, None, None, :]                    # (B, 1, 1, Tk)
    mask_pad = pad_mask[:, :, None].astype(x.dtype)           # (B, T, 1)
    for blk in params["blocks"]:
        x = _block(blk, x, attn_mask, mask_pad, cfg, dtype)
    return x, tok_lens


def fsq_quantize(params, h: jnp.ndarray, cfg: S3TokenizerConfig = S3TokenizerConfig()):
    """Finite scalar quantization: (B, T, n_state) -> int32 token ids (B, T).

    8 dims x 3 levels: digit_i = round(tanh(z_i) * 0.999...) + 1 in {0,1,2},
    index = sum_i digit_i * 3^i (upstream FSQCodebook.encode).
    """
    z = L.linear(params["fsq_proj"], h.astype(jnp.float32))
    digits = jnp.round(jnp.tanh(z) * _FSQ_SCALE).astype(jnp.int32) + 1
    basis = (cfg.fsq_levels ** np.arange(cfg.fsq_dim)).astype(np.int32)
    return jnp.sum(digits * jnp.asarray(basis), axis=-1)


def _quantize_impl(params, mels, mel_lens, cfg: S3TokenizerConfig, dtype):
    h, tok_lens = encode(params, mels, mel_lens, cfg, dtype)
    return fsq_quantize(params, h, cfg), tok_lens


_quantize_jit = jax.jit(_quantize_impl, static_argnames=("cfg", "dtype"))


def quantize(params, mels: jnp.ndarray, mel_lens: jnp.ndarray,
             cfg: S3TokenizerConfig = S3TokenizerConfig(), dtype=jnp.float32):
    """Public API mirroring the package's quantize(): mels -> (tokens, lens).
    Jitted end-to-end (one program per mel-length bucket)."""
    return _quantize_jit(params, mels, mel_lens, cfg, dtype)


# ---------------------------------------------------------------------------
# waveform-level convenience (reference forward(): s3tokenizer.py:90-126)
# ---------------------------------------------------------------------------

def pad_to_token_multiple(wav: np.ndarray, sr: int = S3_SR) -> np.ndarray:
    """Zero-pad so duration is a whole number of 40 ms tokens
    (reference: s3tokenizer.py:54-76)."""
    n_tokens = int(np.ceil(wav.shape[-1] / sr * S3_TOKEN_RATE))
    target = int(n_tokens * (sr / S3_TOKEN_RATE))
    if target > wav.shape[-1]:
        pad = [(0, 0)] * (wav.ndim - 1) + [(0, target - wav.shape[-1])]
        wav = np.pad(wav, pad)
    return wav


def tokenize_wave(params, wav_16k: jnp.ndarray, max_len: int | None = None,
                  cfg: S3TokenizerConfig = S3TokenizerConfig(), dtype=jnp.float32):
    """wav_16k (B, T) -> (tokens (B, T_tok), lens (B,)). Mel frames are
    truncated to 4*max_len when a token cap is given (reference:
    s3tokenizer.py:108-115)."""
    mels = mel_ops.log_mel_s3tokenizer(wav_16k, n_fft=cfg.n_fft, hop=cfg.hop,
                                       n_mels=cfg.n_mels)
    if max_len is not None:
        mels = mels[..., : max_len * 4]
    mel_lens = jnp.full((mels.shape[0],), mels.shape[-1], jnp.int32)
    return quantize(params, mels, mel_lens, cfg, dtype)


def drop_invalid_tokens(tokens: np.ndarray) -> np.ndarray:
    """Strip SOS/EOS markers from a 1-D id sequence
    (reference: models/s3tokenizer/__init__.py:16-30)."""
    tokens = np.asarray(tokens).reshape(-1)
    sos_idx = np.nonzero(tokens == SPEECH_VOCAB_SIZE)[0]
    eos_idx = np.nonzero(tokens == SPEECH_VOCAB_SIZE + 1)[0]
    start = int(sos_idx[0]) + 1 if sos_idx.size else 0
    end = int(eos_idx[0]) if eos_idx.size else tokens.shape[0]
    return tokens[start:end]
