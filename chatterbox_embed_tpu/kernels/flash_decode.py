"""Pallas TPU flash-decode attention for the T3 autoregressive loop.

Single-token decode against a static KV cache. The XLA fallback reads the
ENTIRE padded cache every step (the compiler cannot know that slots past
`cache_pos` are dead); this kernel walks the cache in CHUNK-sized slabs with
double-buffered HBM->VMEM DMAs, starts at the first live slab (`start`'s
chunk — bucket left-padding is never read) and stops at the current
position — on average halving decode-attention HBM traffic, the dominant
per-step cost after weight streaming.

Layout: the cache is stored sequence-major, (L, B*H*D). With T3's shapes
(B CFG rows x H=16 heads x D=64) the feature dim is B*1024, so chunk DMAs
are tile-aligned. Per-head reductions over the packed feature dim are ONE
matmul against a block-diagonal 0/1 matrix R (Fb x Gb): grouped sums ride
the MXU instead of unsupported multi-batch dots.

Batching: a 1-D grid over ROW BLOCKS. Each program owns `rb` rows
(Fb = rb*H*D features), walking its column stripe of the cache; the VMEM
chunk buffers are sized per stripe, so fused batches of any width fit
(the round-2 kernel was hard-limited to the single-utterance CFG pair).

Ragged batches: an optional per-row key HOLE [hole_lo, hole_hi) masks each
row's dead text-pad slots (batched right-padded text) — the whole batched
serving path stays on the kernel instead of falling back to XLA.

  q        (1, F)    VMEM, blocked (1, Fb) per program
  k, v     (L, F)    HBM; stripe DMA'd in (CHUNK, Fb) slabs
  pos_ref  [cache_pos, start] SMEM: attend to slots [start, cache_pos]
  hole     (2, G)    int32, blocked (2, Gb): per-group [lo, hi) dead range
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
# per-program VMEM budget for the double-buffered k/v chunk slabs (bytes);
# VMEM is ~16 MB/core on v4/v5e — stay at half so q/out/logits tiles fit
_BUF_BUDGET = 8 << 20


def _row_block(b: int, h: int, d: int, itemsize: int) -> int:
    """Rows per program: the largest divisor of B whose stripe (rb*H*D) is
    128-lane-aligned AND keeps the 2(double-buffer) x 2(k,v) CHUNK slabs
    inside the VMEM budget. Falls back to one program over all rows when no
    aligned sub-stripe exists (tiny test configs)."""
    cap = max(_BUF_BUDGET // (4 * CHUNK * itemsize * h * d), 1)
    for cand in range(min(b, cap), 0, -1):
        if b % cand == 0 and (cand * h * d) % 128 == 0:
            return cand
    return b


def _kernel(head_dim: int, pos_ref, q_ref, hole_ref, k_hbm, v_hbm, out_ref,
            k_buf, v_buf, sems):
    fb = q_ref.shape[1]                          # rb * H * D (this stripe)
    gb = fb // head_dim                          # rb * H groups
    # hole blocks are lane-padded to 128 (Mosaic block tiling); the live
    # entries are the first gb lanes
    hole_lo = hole_ref[0:1, :gb]                 # (1, Gb) int32
    hole_hi = hole_ref[1:2, :gb]
    g = pl.program_id(0)
    pos = pos_ref[0]
    start = pos_ref[1]
    # slots < start are dead (bucket left-padding) — skip their slabs
    # entirely instead of DMAing them and masking to zero
    c0 = start // CHUNK
    n_chunks = (pos + CHUNK) // CHUNK            # ceil((pos+1)/CHUNK)
    scale = 1.0 / math.sqrt(head_dim)

    q = q_ref[:].astype(jnp.float32)             # (1, Fb)
    # block-diagonal group-reduction matrix: R[j, gg] = 1 iff j // head_dim == gg
    r = (jax.lax.broadcasted_iota(jnp.int32, (fb, gb), 0) // head_dim
         == jax.lax.broadcasted_iota(jnp.int32, (fb, gb), 1)).astype(jnp.float32)
    col0 = g * fb

    def dma(slot, c):
        return (pltpu.make_async_copy(
                    k_hbm.at[pl.ds(c * CHUNK, CHUNK), pl.ds(col0, fb)],
                    k_buf.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(
                    v_hbm.at[pl.ds(c * CHUNK, CHUNK), pl.ds(col0, fb)],
                    v_buf.at[slot], sems.at[slot, 1]))

    kd, vd = dma(c0 % 2, c0)
    kd.start()
    vd.start()

    def body(c, carry):
        m, l, acc = carry                        # (1,Gb), (1,Gb), (1,Fb)
        slot = c % 2

        @pl.when(c + 1 < n_chunks)
        def _():
            kd_n, vd_n = dma((c + 1) % 2, c + 1)
            kd_n.start()
            vd_n.start()

        kd_c, vd_c = dma(slot, c)
        kd_c.wait()
        vd_c.wait()

        k = k_buf[slot]                          # (C, Fb) cache dtype
        v = v_buf[slot].astype(jnp.float32)
        # q*k products in the cache dtype (bf16 on TPU), accumulated fp32 by
        # the group-reduction matmul — halves the VPU broadcast-multiply cost
        prod = (q.astype(k.dtype) * k)           # broadcast (C, Fb)
        logits = jnp.dot(prod, r.astype(prod.dtype),
                         preferred_element_type=jnp.float32) * scale  # (C, Gb)
        idx = c * CHUNK + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        valid = ((idx <= pos) & (idx >= start)
                 & ~((idx >= hole_lo) & (idx < hole_hi)))   # (C, Gb)
        logits = jnp.where(valid, logits, jnp.float32(-1e30))

        m_new = jnp.maximum(m, jnp.max(logits, axis=0, keepdims=True))  # (1, Gb)
        p = jnp.exp(logits - m_new) * valid      # (C, Gb)
        alpha = jnp.exp(m - m_new)               # (1, Gb)
        l_new = l * alpha + jnp.sum(p, axis=0, keepdims=True)
        p_full = jnp.dot(p, r.T, preferred_element_type=jnp.float32)    # (C, Fb)
        alpha_full = jnp.dot(alpha, r.T, preferred_element_type=jnp.float32)
        acc_new = acc * alpha_full + jnp.sum(p_full * v, axis=0, keepdims=True)
        return m_new, l_new, acc_new

    m0 = jnp.full((1, gb), -1e30, jnp.float32)
    l0 = jnp.zeros((1, gb), jnp.float32)
    acc0 = jnp.zeros((1, fb), jnp.float32)
    m, l, acc = jax.lax.fori_loop(c0, n_chunks, body, (m0, l0, acc0))
    l_full = jnp.dot(l, r.T, preferred_element_type=jnp.float32)
    out_ref[:] = (acc / l_full).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     cache_pos: jnp.ndarray, start: jnp.ndarray | int = 0,
                     hole: jnp.ndarray | None = None,
                     interpret: bool | None = None) -> jnp.ndarray:
    """q (B, H, D), k/v sequence-major (L, B, H, D) -> (B, H, D).

    Attends to slots [start, cache_pos], minus each row's optional
    `hole` (B, 2) int32 dead range [lo, hi) (ragged right-padded text).
    L must be a CHUNK multiple and H*D a multiple of 128.

    interpret=None auto-selects the Pallas interpreter on CPU backends so
    CHATTERBOX_PALLAS=1 drives the identical kernel code path in tests.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    b, h, d = q.shape
    lcache = k.shape[0]
    f = b * h * d
    assert lcache % CHUNK == 0, f"cache length {lcache} must be a multiple of {CHUNK}"
    assert f % 128 == 0, f"B*H*D={f} must be 128-aligned for TPU tiling"
    pos = jnp.stack([jnp.asarray(cache_pos, jnp.int32).reshape(()),
                     jnp.asarray(start, jnp.int32).reshape(())])
    rb = _row_block(b, h, d, k.dtype.itemsize)
    fb = rb * h * d
    gb = rb * h
    # Mosaic block tiling wants 128-divisible lane dims: lay the per-group
    # holes out as (2, nprog * gbp) with each program's gb entries at the
    # front of a 128-lane-padded slot
    gbp = -(-gb // 128) * 128
    nprog = b // rb
    if hole is None:
        hole_g = jnp.zeros((2, nprog * gbp), jnp.int32)
    else:
        # per-row [lo, hi) broadcast to the row's H head-groups
        hg = jnp.repeat(jnp.asarray(hole, jnp.int32).T, h, axis=1)  # (2, B*H)
        hg = hg.reshape(2, nprog, gb)
        hole_g = jnp.pad(hg, ((0, 0), (0, 0), (0, gbp - gb))).reshape(2, -1)
    out = pl.pallas_call(
        functools.partial(_kernel, d),
        grid=(nprog,),
        out_shape=jax.ShapeDtypeStruct((1, f), q.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, fb), lambda g: (0, g)),
            pl.BlockSpec((2, gbp), lambda g: (0, g)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, fb), lambda g: (0, g)),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, fb), k.dtype),
            pltpu.VMEM((2, CHUNK, fb), v.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(pos, q.reshape(1, f), hole_g, k.reshape(lcache, f), v.reshape(lcache, f))
    return out.reshape(b, h, d)


def decode_attention_reference(q, k, v, cache_pos, start=0, hole=None):
    """Pure-jnp reference (also the CPU fallback path). k/v (L, B, H, D)."""
    lcache = k.shape[0]
    kb = jnp.moveaxis(k, 0, 1)   # (B, L, H, D)
    vb = jnp.moveaxis(v, 0, 1)
    idx = jnp.arange(lcache)
    mask = ((idx <= cache_pos) & (idx >= start))[None, None, :]
    if hole is not None:
        hole = jnp.asarray(hole, jnp.int32)
        dead = (idx[None, :] >= hole[:, :1]) & (idx[None, :] < hole[:, 1:2])
        mask = mask & ~dead[:, None, :]
    logits = jnp.einsum("bhd,bkhd->bhk", q.astype(jnp.float32),
                        kb.astype(jnp.float32)) / math.sqrt(q.shape[-1])
    logits = jnp.where(mask, logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhk,bkhd->bhd", w, vb.astype(jnp.float32)).astype(q.dtype)
