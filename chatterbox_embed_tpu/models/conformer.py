"""Upsampling conformer encoder for the S3Gen flow: 25 Hz token embeddings ->
50 Hz mel-rate features (reference: models/s3gen/transformer/upsample_encoder.py:99-318,
attention.py:203-330, encoder_layer.py:109-236, embedding.py:200-294,
subsampling.py:69-113).

Architecture: linear embed + espnet relative PE, a 3-frame pre-lookahead conv,
6 conformer blocks (rel-pos MHA + FFN, pre-norm), nearest x2 upsample with a
causal conv, 4 more blocks, final LayerNorm.

TPU design: the espnet rel-shift (pad/reshape trick in torch) is a static
gather on the (2T-1) position axis; both matmul terms of the Transformer-XL
score ride the MXU via einsum; softmax in fp32.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ConformerConfig
from . import layers as L


def init(key, cfg: ConformerConfig = ConformerConfig()):
    keys = iter(L.split_keys(key, 64 + 16 * (cfg.num_blocks + cfg.num_up_blocks)))
    nk = lambda: next(keys)
    d, h = cfg.output_size, cfg.attention_heads

    def block_init():
        return {
            "norm_mha": L.layer_norm_init(d),
            "q": L.linear_init(nk(), d, d),
            "k": L.linear_init(nk(), d, d),
            "v": L.linear_init(nk(), d, d),
            "o": L.linear_init(nk(), d, d),
            "pos": L.linear_init(nk(), d, d, bias=False),
            "pos_bias_u": L.uniform_(nk(), (h, d // h), math.sqrt(6 / (2 * d // h))),
            "pos_bias_v": L.uniform_(nk(), (h, d // h), math.sqrt(6 / (2 * d // h))),
            "norm_ff": L.layer_norm_init(d),
            "ff1": L.linear_init(nk(), d, cfg.linear_units),
            "ff2": L.linear_init(nk(), cfg.linear_units, d),
        }

    return {
        "embed": {"lin": L.linear_init(nk(), cfg.input_size, d), "ln": L.layer_norm_init(d)},
        "lookahead": {"conv1": L.conv1d_init(nk(), cfg.pre_lookahead_len + 1, d, d),
                      "conv2": L.conv1d_init(nk(), 3, d, d)},
        "blocks": [block_init() for _ in range(cfg.num_blocks)],
        "up_conv": L.conv1d_init(nk(), cfg.upsample_stride * 2 + 1, d, d),
        "up_embed": {"lin": L.linear_init(nk(), cfg.input_size, d), "ln": L.layer_norm_init(d)},
        "up_blocks": [block_init() for _ in range(cfg.num_up_blocks)],
        "after_norm": L.layer_norm_init(d),
    }


def _espnet_rel_pe(t: int, d: int) -> np.ndarray:
    """(2T-1, d) positions ordered rel=+T-1 ... 0 ... -(T-1)
    (reference: embedding.py:200-294)."""
    pos = np.arange(t, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float32) * -(math.log(10_000.0) / d))
    pe_pos = np.zeros((t, d), np.float32)
    pe_pos[:, 0::2] = np.sin(pos * div)
    pe_pos[:, 1::2] = np.cos(pos * div)
    pe_neg = np.zeros((t, d), np.float32)
    pe_neg[:, 0::2] = np.sin(-pos * div)
    pe_neg[:, 1::2] = np.cos(-pos * div)
    return np.concatenate([pe_pos[::-1], pe_neg[1:]], axis=0)


def _rel_shift(bd_full: jnp.ndarray) -> jnp.ndarray:
    """espnet rel-shift: bd[i, j] = bd_full[i, (T-1) - i + j].

    Implemented with the pad+reshape trick (linear copies). The obvious
    take_along_axis gather on the minor axis is ~25x slower on TPU (per-lane
    dynamic addressing) — it took this encoder from 11 ms to 277 ms.
    """
    b, h, t, p = bd_full.shape
    xpad = jnp.pad(bd_full, ((0, 0), (0, 0), (0, 0), (1, 0)))   # (B,H,T,2T)
    xr = xpad.reshape(b, h, p + 1, t)[:, :, 1:]                 # (B,H,2T-1,T)
    return xr.reshape(b, h, t, p)[..., :t]


def _rel_attention(p, x, pos_emb, pad_mask, n_heads, dtype):
    """Transformer-XL style scores: (q+u)k^T + rel_shift((q+v)p^T)."""
    b, t, d = x.shape
    dk = d // n_heads
    q = L.split_heads(L.linear(p["q"], x, dtype), n_heads)   # (B, T, H, dk)
    k = L.split_heads(L.linear(p["k"], x, dtype), n_heads)
    v = L.split_heads(L.linear(p["v"], x, dtype), n_heads)
    pe = L.linear(p["pos"], pos_emb.astype(dtype))            # (2T-1, d)
    pe = pe.reshape(-1, n_heads, dk)

    qu = q + p["pos_bias_u"].astype(q.dtype)
    qv = q + p["pos_bias_v"].astype(q.dtype)
    bd_full = jnp.einsum("bqhd,phd->bhqp", qv, pe, preferred_element_type=jnp.float32)
    bd = _rel_shift(bd_full)

    if L.use_flash_attention(b):
        # ac, the combined fp32 scores and the softmax weights stay in VMEM;
        # only the rel-pos bd term is materialised (kernel adds ab before
        # sm_scale, matching (ac + bd) / sqrt(dk))
        out = L.mha_flash(qu, k, v, key_valid=pad_mask, ab=bd)
        return L.linear(p["o"], L.merge_heads(out), dtype)

    ac = jnp.einsum("bqhd,bkhd->bhqk", qu, k, preferred_element_type=jnp.float32)
    logits = (ac + bd) / math.sqrt(dk)
    if pad_mask is not None:
        logits = jnp.where(pad_mask[:, None, None, :], logits, jnp.float32(-jnp.inf))
        w = jax.nn.softmax(logits, axis=-1)
        w = jnp.where(pad_mask[:, None, None, :], w, 0.0)
    else:
        w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v)
    return L.linear(p["o"], L.merge_heads(out), dtype)


def _conformer_block(p, x, pos_emb, pad_mask, n_heads, eps, dtype):
    h = L.layer_norm(p["norm_mha"], x, eps)
    x = x + _rel_attention(p, h, pos_emb, pad_mask, n_heads, dtype)
    h = L.layer_norm(p["norm_ff"], x, eps)
    h = L.linear(p["ff2"], jax.nn.silu(L.linear(p["ff1"], h, dtype)), dtype)
    return x + h


def _lookahead(p, x, pre_len, dtype):
    """Right-context conv + causal conv with residual
    (reference: upsample_encoder.py:66-96)."""
    h = L.conv1d(p["conv1"], x, padding=(0, pre_len), dtype=dtype)
    h = jax.nn.leaky_relu(h, 0.01)
    h = L.conv1d(p["conv2"], h, padding=(2, 0), dtype=dtype)
    return x + h


def forward(params, x: jnp.ndarray, lens: jnp.ndarray | None = None,
            cfg: ConformerConfig = ConformerConfig(), dtype=jnp.float32):
    """x: (B, T, 512) embedded tokens -> (B, 2T, 512) mel-rate features."""
    b, t, _ = x.shape
    pad_mask = None if lens is None else (jnp.arange(t)[None] < lens[:, None])

    xscale = math.sqrt(cfg.output_size)
    h = L.layer_norm(params["embed"]["ln"],
                     L.linear(params["embed"]["lin"], x.astype(dtype), dtype),
                     cfg.embed_ln_eps) * xscale
    if pad_mask is not None:
        # zero pad positions so bucketed (padded) inference is bit-identical
        # to exact-length inference: the lookahead conv's right context then
        # sees literal zeros either way
        h = h * pad_mask[..., None].astype(h.dtype)
    pos = jnp.asarray(_espnet_rel_pe(t, cfg.output_size))

    h = _lookahead(params["lookahead"], h, cfg.pre_lookahead_len, dtype)
    for blk in params["blocks"]:
        h = _conformer_block(blk, h, pos, pad_mask, cfg.attention_heads, cfg.ln_eps, dtype)

    # nearest x2 upsample + left-padded conv (reference: upsample_encoder.py:37-63)
    s = cfg.upsample_stride
    h = jnp.repeat(h, s, axis=1)
    h = jnp.pad(h, ((0, 0), (2 * s, 0), (0, 0)))
    h = L.conv1d(params["up_conv"], h, padding="VALID", dtype=dtype)

    t2 = h.shape[1]
    pad_mask2 = None if lens is None else (jnp.arange(t2)[None] < (lens * s)[:, None])
    h = L.layer_norm(params["up_embed"]["ln"],
                     L.linear(params["up_embed"]["lin"], h, dtype),
                     cfg.embed_ln_eps) * xscale
    if pad_mask2 is not None:
        h = h * pad_mask2[..., None].astype(h.dtype)
    pos2 = jnp.asarray(_espnet_rel_pe(t2, cfg.output_size))
    for blk in params["up_blocks"]:
        h = _conformer_block(blk, h, pos2, pad_mask2, cfg.attention_heads, cfg.ln_eps, dtype)

    return L.layer_norm(params["after_norm"], h, cfg.embed_ln_eps)
