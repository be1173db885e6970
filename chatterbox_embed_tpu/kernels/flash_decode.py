"""Pallas TPU flash-decode attention for the T3 autoregressive loop.

Single-token decode against a static KV cache. The XLA fallback reads the
ENTIRE padded cache every step (the compiler cannot know that slots past
`cache_pos` are dead); this kernel walks the cache in CHUNK-sized slabs with
double-buffered HBM->VMEM DMAs and simply stops at the current position —
on average halving decode-attention HBM traffic, the dominant per-step cost
after weight streaming.

Shapes (T3: B=2 fused-CFG rows, H=16 heads, D=64):
  q        (B, H, D)        VMEM
  k, v     (B, L, H, D)     HBM, L = padded cache capacity
  cache_pos scalar          SMEM (attend to slots [0, cache_pos])
Returns (B, H, D).

Flash-style streaming softmax in fp32; per-chunk masking only in the final
slab. Used on TPU; tests run the same kernel in interpreter mode.
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


def _kernel(pos_ref, q_ref, k_hbm, v_hbm, out_ref, k_buf, v_buf, sems):
    b, h, d = q_ref.shape
    pos = pos_ref[0]
    start = pos_ref[1]               # first valid slot (left-pad exclusion)
    n_chunks = (pos + CHUNK) // CHUNK  # ceil((pos+1)/CHUNK)
    scale = 1.0 / math.sqrt(d)

    q = q_ref[:].astype(jnp.float32)                   # (B, H, D)

    def dma(slot, c):
        return pltpu.make_async_copy(
            k_hbm.at[:, pl.ds(c * CHUNK, CHUNK)], k_buf.at[slot], sems.at[slot, 0]
        ), pltpu.make_async_copy(
            v_hbm.at[:, pl.ds(c * CHUNK, CHUNK)], v_buf.at[slot], sems.at[slot, 1]
        )

    kd, vd = dma(0, 0)
    kd.start()
    vd.start()

    def body(c, carry):
        m, l, acc = carry
        slot = c % 2

        @pl.when(c + 1 < n_chunks)
        def _():
            kd_n, vd_n = dma((c + 1) % 2, c + 1)
            kd_n.start()
            vd_n.start()

        kd_c, vd_c = dma(slot, c)
        kd_c.wait()
        vd_c.wait()

        k = k_buf[slot].astype(jnp.float32)            # (B, CHUNK, H, D)
        v = v_buf[slot].astype(jnp.float32)
        logits = jnp.einsum("bhd,bchd->bhc", q, k,
                            preferred_element_type=jnp.float32) * scale
        idx = c * CHUNK + jax.lax.broadcasted_iota(jnp.int32, (1, 1, CHUNK), 2)
        valid = (idx <= pos) & (idx >= start)
        # finite mask value + explicit zeroing keeps a fully-masked chunk
        # (pads before `start`) from poisoning the streaming softmax with NaNs
        logits = jnp.where(valid, logits, jnp.float32(-1e30))

        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.exp(logits - m_new) * valid            # (B, H, C)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha[..., None] + jnp.einsum(
            "bhc,bchd->bhd", p, v, preferred_element_type=jnp.float32)[:, :, None, :]
        return m_new, l_new, acc_new

    m0 = jnp.full((b, h, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((b, h, 1), jnp.float32)
    acc0 = jnp.zeros((b, h, 1, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_chunks, body, (m0, l0, acc0))
    out_ref[:] = (acc[:, :, 0, :] / l).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     cache_pos: jnp.ndarray, start: jnp.ndarray | int = 0,
                     interpret: bool = False) -> jnp.ndarray:
    """q (B, H, D), k/v (B, L, H, D) -> (B, H, D). Attends [start, cache_pos]."""
    b, h, d = q.shape
    lcache = k.shape[1]
    assert lcache % CHUNK == 0, f"cache length {lcache} must be a multiple of {CHUNK}"
    pos = jnp.stack([jnp.asarray(cache_pos, jnp.int32).reshape(()),
                     jnp.asarray(start, jnp.int32).reshape(())])
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, d), q.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, b, CHUNK, h, d), k.dtype),
            pltpu.VMEM((2, b, CHUNK, h, d), v.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(pos, q, k, v)


def decode_attention_reference(q, k, v, cache_pos, start=0):
    """Pure-jnp reference (also the CPU fallback path)."""
    lcache = k.shape[1]
    idx = jnp.arange(lcache)
    mask = ((idx <= cache_pos) & (idx >= start))[None, None, :]
    logits = jnp.einsum("bhd,bkhd->bhk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / math.sqrt(q.shape[-1])
    logits = jnp.where(mask, logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhk,bkhd->bhd", w, v.astype(jnp.float32)).astype(q.dtype)
