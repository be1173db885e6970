"""Upsampling conformer encoder for the S3Gen flow: 25 Hz token embeddings ->
50 Hz mel-rate features (reference: models/s3gen/transformer/upsample_encoder.py:99-318,
attention.py:203-330, encoder_layer.py:109-236, embedding.py:200-294,
subsampling.py:69-113).

Architecture: linear embed + espnet relative PE, a 3-frame pre-lookahead conv,
6 conformer blocks (rel-pos MHA + FFN, pre-norm), nearest x2 upsample with a
causal conv, 4 more blocks, final LayerNorm.

TPU design: the Transformer-XL bd term is FACTORED via the sine
angle-addition identity (see _rel_factors / kernels/rel_attention.py) —
bd = A C^T + B S^T with no (2T-1) band tensor and no rel-shift, so both
score terms are plain MXU matmuls; at batch the whole masked attention runs
in a Pallas kernel with the (B,H,T,T) scores VMEM-resident. Softmax in fp32.
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


def _rel_trig(t: int, d: int):
    """(t, d/2) sin/cos tables at the espnet PE frequencies."""
    div = np.exp(np.arange(0, d, 2, dtype=np.float32) * -(math.log(10_000.0) / d))
    ang = np.arange(t, dtype=np.float32)[:, None] * div
    return np.sin(ang), np.cos(ang)


def _rel_factors(p, qv, n_heads, sin_t, cos_t):
    """Factor the Transformer-XL bd term (kernels/rel_attention.py docstring):

      bd[i,j] = (q[i]+v) . pe_proj[(T-1)-i+j] = A[i] . C[j] + B[i] . S[j]

    with g[i] = W_pos_h^T (q[i]+v) projected back to model dim and A/B the
    angle-addition recombination of g with the i-side trig tables. Exact
    (trig identity) — replaces the (B, H, T, 2T-1) bd_full einsum + rel
    shift of the torch formulation (reference: attention.py:203-330) with
    two rank-d/2 products. Returns A, B of shape (B, T, H, d/2)."""
    b, t, h, dk = qv.shape
    d = h * dk
    w_pos = p["pos"]["w"].reshape(d, h, dk)                  # (d, H, dk)
    g = jnp.einsum("bihc,mhc->bihm", qv, w_pos.astype(qv.dtype))  # (B,T,H,d)
    sin_i = jnp.asarray(sin_t)[None, :, None, :].astype(g.dtype)
    cos_i = jnp.asarray(cos_t)[None, :, None, :].astype(g.dtype)
    g_sin, g_cos = g[..., 0::2], g[..., 1::2]
    a = g_sin * sin_i + g_cos * cos_i
    bb = -g_sin * cos_i + g_cos * sin_i
    return a, bb


def _rel_attention(p, x, trig, pad_mask, n_heads, dtype):
    """Transformer-XL style scores (q+u)k^T + bd via the factored rel-pos
    form — no (2T-1) axis, no rel-shift (see _rel_factors)."""
    b, t, d = x.shape
    dk = d // n_heads
    q = L.split_heads(L.linear(p["q"], x, dtype), n_heads)   # (B, T, H, dk)
    k = L.split_heads(L.linear(p["k"], x, dtype), n_heads)
    v = L.split_heads(L.linear(p["v"], x, dtype), n_heads)
    sin_t, cos_t = trig

    qu = q + p["pos_bias_u"].astype(q.dtype)
    qv = q + p["pos_bias_v"].astype(q.dtype)
    a, bb = _rel_factors(p, qv, n_heads, sin_t, cos_t)       # (B, T, H, d/2)

    if L.pallas_gate(b >= 4):
        # one augmented matmul per program: [qu|A|B] . [k|C|S]^T with the
        # softmax and p@v entirely in VMEM — the (B,H,T,T) scores (and the
        # old 2T-1 band tensor) never touch HBM
        from ..kernels.rel_attention import rel_attention
        cs = jnp.concatenate([jnp.asarray(cos_t), jnp.asarray(sin_t)], axis=-1)
        cs = jnp.broadcast_to(cs[None, :, None, :].astype(k.dtype),
                              (b, t, n_heads, d))
        q_aug = jnp.concatenate([qu, a.astype(q.dtype), bb.astype(q.dtype)],
                                axis=-1)
        k_aug = jnp.concatenate([k, cs], axis=-1)
        kv_mask = (pad_mask if pad_mask is not None
                   else jnp.ones((b, t), jnp.bool_))
        out = rel_attention(q_aug, k_aug, v, kv_mask, 1.0 / math.sqrt(dk))
        return L.linear(p["o"], L.merge_heads(out), dtype)

    ac = jnp.einsum("bqhd,bkhd->bhqk", qu, k, preferred_element_type=jnp.float32)
    cos_j = jnp.asarray(cos_t).astype(a.dtype)
    sin_j = jnp.asarray(sin_t).astype(a.dtype)
    bd = (jnp.einsum("bihm,jm->bhij", a, cos_j, preferred_element_type=jnp.float32)
          + jnp.einsum("bihm,jm->bhij", bb, sin_j, preferred_element_type=jnp.float32))
    logits = (ac + bd) / math.sqrt(dk)
    if pad_mask is not None:
        logits = jnp.where(pad_mask[:, None, None, :], logits, jnp.float32(-jnp.inf))
        w = jax.nn.softmax(logits, axis=-1)
        w = jnp.where(pad_mask[:, None, None, :], w, 0.0)
    else:
        w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v)
    return L.linear(p["o"], L.merge_heads(out), dtype)


def _conformer_block(p, x, trig, pad_mask, n_heads, eps, dtype):
    h = L.layer_norm(p["norm_mha"], x, eps)
    x = x + _rel_attention(p, h, trig, pad_mask, n_heads, dtype)
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
    trig = _rel_trig(t, cfg.output_size)

    h = _lookahead(params["lookahead"], h, cfg.pre_lookahead_len, dtype)
    for blk in params["blocks"]:
        h = _conformer_block(blk, h, trig, pad_mask, cfg.attention_heads, cfg.ln_eps, dtype)

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
    trig2 = _rel_trig(t2, cfg.output_size)
    for blk in params["up_blocks"]:
        h = _conformer_block(blk, h, trig2, pad_mask2, cfg.attention_heads, cfg.ln_eps, dtype)

    return L.layer_norm(params["after_norm"], h, cfg.embed_ln_eps)
