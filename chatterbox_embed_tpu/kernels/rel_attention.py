"""Pallas TPU attention for the conformer's Transformer-XL rel-pos scores.

The espnet/Transformer-XL score is ac + bd with
  ac[i,j] = (q[i]+u) . k[j]
  bd[i,j] = (q[i]+v) . pe_proj[(T-1) - i + j]
The torch reference (and the round-2 port) materialises bd as a
(B, H, T, 2T-1) tensor plus a rel-shift — at batch 16 / T 512 that is
~270 MB of fp32 HBM traffic per block, the conformer's dominant cost
(PERF_NOTES.md agenda #1).

Round-3 removes the (2T-1) axis entirely. pe rows are sinusoids, so with
g[i] = W_pos_h^T (q[i]+v)  (projecting the query back to model dim),
the angle-addition identity factors the band matrix into two rank-d/2
products with NO shift and NO relative axis:

  bd[i,j] = g[i] . pe[T-1-(i-j)]
          = A[i] . C[j] + B[i] . S[j]
  A[i,d] =  g[i,2d] sin(i w_d) + g[i,2d+1] cos(i w_d)
  B[i,d] = -g[i,2d] cos(i w_d) + g[i,2d+1] sin(i w_d)
  C[j,d] = cos(j w_d),  S[j,d] = sin(j w_d)

(verified to 3e-15 against the gathered form). The full score is then ONE
matmul over an augmented feature dim:

  ac + bd = [qu; A; B] . [k; C; S]^T

This kernel runs that matmul with the softmax and the p@v product entirely
in VMEM: per (batch*head, q-tile) program it loads the full augmented k row
(T x Da, ~1.3 MB bf16 at T=1024) and v, computes masked softmax exactly
(no online accumulation needed), and writes the (BQ, Dv) output tile. The
(B, H, T, T) scores never touch HBM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 128  # query tile rows


def _kernel(scale: float, q_ref, k_ref, v_ref, m_ref, o_ref):
    # layout (B, H, T, D): q (1, 1, BQ, Da)  k (1, 1, Tp, Da)
    # v (1, 1, Tp, Dv)  m (1, 1, Tp) int32
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    valid = m_ref[0, 0, :][None, :] > 0                   # (1, Tp)
    s = jnp.where(valid, s, jnp.float32(-1e30))
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s) * valid                                # (BQ, Tp) fp32
    den = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    o = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0, 0],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0, 0] = (o / den).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def rel_attention(q_aug: jnp.ndarray, k_aug: jnp.ndarray, v: jnp.ndarray,
                  key_valid: jnp.ndarray, scale: float,
                  interpret: bool | None = None) -> jnp.ndarray:
    """Masked softmax((q_aug @ k_aug^T) * scale) @ v, scores VMEM-resident.

    q_aug, k_aug: (B, T, H, Da) augmented features [qu|A|B] / [k|C|S];
    v: (B, T, H, Dv); key_valid: (B, T) bool. Returns (B, T, H, Dv).
    Invalid queries attend the valid keys (finite outputs; callers mask).

    interpret=None auto-selects the Pallas interpreter on CPU backends.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    b, t, h, da = q_aug.shape
    dv = v.shape[-1]
    tp = -(-t // BQ) * BQ
    dap = -(-da // 128) * 128
    pad_t = tp - t
    pad_d = dap - da
    if pad_t or pad_d:
        q_aug = jnp.pad(q_aug, ((0, 0), (0, pad_t), (0, 0), (0, pad_d)))
        k_aug = jnp.pad(k_aug, ((0, 0), (0, pad_t), (0, 0), (0, pad_d)))
        v = jnp.pad(v, ((0, 0), (0, pad_t), (0, 0), (0, 0)))
    mask = jnp.pad(key_valid, ((0, 0), (0, pad_t))).astype(jnp.int32)[:, None, :]
    # (B, H, T, D): Mosaic block tiling wants the T/D axes as the last two
    q_aug = jnp.swapaxes(q_aug, 1, 2)
    k_aug = jnp.swapaxes(k_aug, 1, 2)
    v = jnp.swapaxes(v, 1, 2)

    out = pl.pallas_call(
        functools.partial(_kernel, scale),
        grid=(b * h, tp // BQ),
        out_shape=jax.ShapeDtypeStruct((b, h, tp, dv), v.dtype),
        in_specs=[
            pl.BlockSpec((1, 1, BQ, dap), lambda bh, qi: (bh // h, bh % h, qi, 0)),
            pl.BlockSpec((1, 1, tp, dap), lambda bh, qi: (bh // h, bh % h, 0, 0)),
            pl.BlockSpec((1, 1, tp, dv), lambda bh, qi: (bh // h, bh % h, 0, 0)),
            pl.BlockSpec((1, 1, tp), lambda bh, qi: (bh // h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, BQ, dv),
                               lambda bh, qi: (bh // h, bh % h, qi, 0)),
        interpret=interpret,
    )(q_aug, k_aug, v, mask)
    return jnp.swapaxes(out, 1, 2)[:, :t]
