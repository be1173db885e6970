"""Pallas TPU flash-decode attention for the T3 autoregressive loop.

Single-token decode against a static KV cache. The XLA fallback reads the
ENTIRE padded cache every step (the compiler cannot know that slots past
`cache_pos` are dead); this kernel walks the cache in CHUNK-sized slabs with
double-buffered HBM->VMEM DMAs and simply stops at the current position —
on average halving decode-attention HBM traffic, the dominant per-step cost
after weight streaming.

Layout: the cache is stored sequence-major, (L, B*H*D). With T3's shapes
(B=2 CFG rows x H=16 heads x D=64) the feature dim is 2048 = 16 lanes x 128,
so chunk DMAs are tile-aligned. Per-head reductions over the packed feature
dim are ONE matmul against a block-diagonal 0/1 matrix R (F x B*H): grouped
sums ride the MXU instead of unsupported multi-batch dots.

  q        (1, F)   VMEM     (flattened (B, H, D))
  k, v     (L, F)   HBM
  pos_ref  [cache_pos, start] SMEM: attend to slots [start, cache_pos]
Returns (1, F), reshaped to (B, H, D) by the wrapper.

Flash-style streaming softmax in fp32; fully-masked slabs (left padding) are
kept finite by masking to -1e30 and zeroing probabilities explicitly.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 256


def _kernel(head_dim: int, pos_ref, q_ref, k_hbm, v_hbm, out_ref, k_buf, v_buf, sems):
    f = q_ref.shape[1]
    groups = f // head_dim                       # B * H
    pos = pos_ref[0]
    start = pos_ref[1]
    # slots < start are dead (bucket left-padding) — skip their slabs
    # entirely instead of DMAing them and masking to zero
    c0 = start // CHUNK
    n_chunks = (pos + CHUNK) // CHUNK            # ceil((pos+1)/CHUNK)
    scale = 1.0 / math.sqrt(head_dim)

    q = q_ref[:].astype(jnp.float32)             # (1, F)
    # block-diagonal group-reduction matrix: R[j, g] = 1 iff j // head_dim == g
    r = (jax.lax.broadcasted_iota(jnp.int32, (f, groups), 0) // head_dim
         == jax.lax.broadcasted_iota(jnp.int32, (f, groups), 1)).astype(jnp.float32)

    def dma(slot, c):
        return (pltpu.make_async_copy(k_hbm.at[pl.ds(c * CHUNK, CHUNK)],
                                      k_buf.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(v_hbm.at[pl.ds(c * CHUNK, CHUNK)],
                                      v_buf.at[slot], sems.at[slot, 1]))

    kd, vd = dma(c0 % 2, c0)
    kd.start()
    vd.start()

    def body(c, carry):
        m, l, acc = carry                        # (1,G), (1,G), (1,F)
        slot = c % 2

        @pl.when(c + 1 < n_chunks)
        def _():
            kd_n, vd_n = dma((c + 1) % 2, c + 1)
            kd_n.start()
            vd_n.start()

        kd_c, vd_c = dma(slot, c)
        kd_c.wait()
        vd_c.wait()

        k = k_buf[slot].astype(jnp.float32)      # (C, F)
        v = v_buf[slot].astype(jnp.float32)
        prod = q * k                             # broadcast (C, F)
        logits = jnp.dot(prod, r, preferred_element_type=jnp.float32) * scale  # (C, G)
        idx = c * CHUNK + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        valid = (idx <= pos) & (idx >= start)    # (C, 1)
        logits = jnp.where(valid, logits, jnp.float32(-1e30))

        m_new = jnp.maximum(m, jnp.max(logits, axis=0, keepdims=True))  # (1, G)
        p = jnp.exp(logits - m_new) * valid      # (C, G)
        alpha = jnp.exp(m - m_new)               # (1, G)
        l_new = l * alpha + jnp.sum(p, axis=0, keepdims=True)
        p_full = jnp.dot(p, r.T, preferred_element_type=jnp.float32)    # (C, F)
        alpha_full = jnp.dot(alpha, r.T, preferred_element_type=jnp.float32)
        acc_new = acc * alpha_full + jnp.sum(p_full * v, axis=0, keepdims=True)
        return m_new, l_new, acc_new

    m0 = jnp.full((1, groups), -1e30, jnp.float32)
    l0 = jnp.zeros((1, groups), jnp.float32)
    acc0 = jnp.zeros((1, f), jnp.float32)
    m, l, acc = jax.lax.fori_loop(c0, n_chunks, body, (m0, l0, acc0))
    l_full = jnp.dot(l, r.T, preferred_element_type=jnp.float32)
    out_ref[:] = (acc / l_full).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     cache_pos: jnp.ndarray, start: jnp.ndarray | int = 0,
                     interpret: bool = False) -> jnp.ndarray:
    """q (B, H, D), k/v sequence-major (L, B, H, D) -> (B, H, D).

    Attends to slots [start, cache_pos]. L must be a CHUNK multiple and
    B*H*D a multiple of 128.
    """
    b, h, d = q.shape
    lcache = k.shape[0]
    f = b * h * d
    assert lcache % CHUNK == 0, f"cache length {lcache} must be a multiple of {CHUNK}"
    assert f % 128 == 0, f"B*H*D={f} must be 128-aligned for TPU tiling"
    pos = jnp.stack([jnp.asarray(cache_pos, jnp.int32).reshape(()),
                     jnp.asarray(start, jnp.int32).reshape(())])
    out = pl.pallas_call(
        functools.partial(_kernel, d),
        out_shape=jax.ShapeDtypeStruct((1, f), q.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, f), k.dtype),
            pltpu.VMEM((2, CHUNK, f), v.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(pos, q.reshape(1, f), k.reshape(lcache, f), v.reshape(lcache, f))
    return out.reshape(b, h, d)


def decode_attention_reference(q, k, v, cache_pos, start=0):
    """Pure-jnp reference (also the CPU fallback path). k/v (L, B, H, D)."""
    lcache = k.shape[0]
    kb = jnp.moveaxis(k, 0, 1)   # (B, L, H, D)
    vb = jnp.moveaxis(v, 0, 1)
    idx = jnp.arange(lcache)
    mask = ((idx <= cache_pos) & (idx >= start))[None, None, :]
    logits = jnp.einsum("bhd,bkhd->bhk", q.astype(jnp.float32),
                        kb.astype(jnp.float32)) / math.sqrt(q.shape[-1])
    logits = jnp.where(mask, logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhk,bkhd->bhd", w, vb.astype(jnp.float32)).astype(q.dtype)
