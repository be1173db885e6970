"""Pallas TPU flash-decode attention for the T3 autoregressive loop.

Single-token decode against a static KV cache. The XLA fallback reads the
ENTIRE padded cache every step (the compiler cannot know that slots past
`cache_pos` are dead); this kernel walks the cache in chunk-sized slabs with
double-buffered HBM->VMEM DMAs, starts at the first live slab (`start`'s
chunk — bucket left-padding is never read) and stops at the current
position — on average halving decode-attention HBM traffic, the dominant
per-step cost after weight streaming.

Layout: the cache is stored sequence-major, (L, B*H*D). With T3's shapes
(B CFG rows x H=16 heads x D=64) the feature dim is B*1024, so chunk DMAs
are full contiguous rows. Per-head reductions over the packed feature dim
are matmuls against a block-diagonal 0/1 matrix R (Fblk x Gblk): grouped
sums ride the MXU instead of unsupported multi-batch dots.

Batching: ONE program for every batch width. The chunk height shrinks as
the row width grows (slab bytes stay inside the VMEM budget) so the DMA
stream stays deep, contiguous and double-buffered — a row-striped GRID was
measured 30-40us of exposed latency per (program, chunk) unit on v5e, LOSING
to XLA at 16+ rows; the single-program walk amortises it. The feature dim is
processed in static Fblk-wide sub-blocks so the R matrix stays ~1 MB instead
of growing quadratically with batch.

Ragged batches: an optional per-row key HOLE [hole_lo, hole_hi) masks each
row's dead text-pad slots (batched right-padded text) — the whole batched
serving path stays on the kernel instead of falling back to XLA.

  q        (1, F)    VMEM
  k, v     (L, F)    HBM; chunked in (C, F) contiguous slabs
  pos_ref  [cache_pos, start] SMEM: attend to slots [start, cache_pos]
  hole     (2, Gp)   int32 VMEM: per-group [lo, hi) dead range (lane-padded)
Returns (1, F), reshaped to (B, H, D) by the wrapper.

Flash-style streaming softmax in fp32; fully-masked slabs (left padding) are
kept finite by masking to -1e30 and zeroing probabilities explicitly. The
q*k products and the R dots run in the cache dtype (bf16 on TPU — fp32 MXU
runs at 1/4 rate on v5e) with fp32 accumulation, matching the XLA decode
path's w.astype(dtype) convention.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-call VMEM budget for the double-buffered k/v chunk slabs (bytes);
# VMEM is ~16 MB/core on v4/v5e — stay at half so q/out/logits/R tiles fit
_BUF_BUDGET = 8 << 20
_FBLK = 4096          # feature sub-block width (keeps R at (4096, 64) ~1 MB)
_MAX_CHUNK = 512


def _feature_block(f: int, d: int) -> int:
    """Widest stripe <= _FBLK that divides F on a head boundary with
    128-aligned lanes (falls back to the full width)."""
    g = f // d
    want = max(1, -(-f // _FBLK))
    for n in range(want, g + 1):
        if g % n == 0 and (f // n) % 128 == 0:
            return f // n
    return f


def _chunk_rows(f: int, itemsize: int, lcache: int) -> int:
    """Slab height: largest power-of-two <= _MAX_CHUNK that divides the cache
    length AND keeps the double-buffered k+v slabs inside the budget. Very
    wide rows (>16K features, i.e. forced fused batches beyond the measured
    crossover gate) get a reduced budget: the compiler's stack temps for the
    wide accumulators eat the headroom (observed scoped-vmem OOM at 16.18M
    with the full budget at F=32768)."""
    budget = _BUF_BUDGET if f <= (16 << 10) else (6 << 20)
    cap = max(budget // (4 * f * itemsize), 8)
    c = 8
    while c * 2 <= min(cap, _MAX_CHUNK) and lcache % (c * 2) == 0:
        c *= 2
    return c


def _kernel(head_dim: int, fblk: int, has_cur: bool, pos_ref, q_ref, hole_ref,
            kcur_ref, vcur_ref, k_hbm, v_hbm, out_ref, k_buf, v_buf, sems):
    f = q_ref.shape[1]
    n_blk = f // fblk
    gblk = fblk // head_dim
    chunk = k_buf.shape[1]
    pos = pos_ref[0]
    start = pos_ref[1]
    li = pos_ref[2]          # layer index into the stacked (n_layers, Lc, F)
    # slots < start are dead (bucket left-padding) — skip their slabs
    # entirely instead of DMAing them and masking to zero
    c0 = start // chunk
    n_chunks = (pos + chunk) // chunk            # ceil((pos+1)/chunk)
    scale = 1.0 / math.sqrt(head_dim)

    q = q_ref[:]                                 # (1, F)
    # block-diagonal group-reduction matrix: R[j, g] = 1 iff j//head_dim == g
    r32 = (jax.lax.broadcasted_iota(jnp.int32, (fblk, gblk), 0) // head_dim
           == jax.lax.broadcasted_iota(jnp.int32, (fblk, gblk), 1)
           ).astype(jnp.float32)
    rc = r32.astype(k_buf.dtype)

    def dma(slot, c):
        return [pltpu.make_async_copy(k_hbm.at[li, pl.ds(c * chunk, chunk)],
                                      k_buf.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(v_hbm.at[li, pl.ds(c * chunk, chunk)],
                                      v_buf.at[slot], sems.at[slot, 1])]

    for cp in dma(c0 % 2, c0):
        cp.start()

    def body(c, carry):
        m, l, acc = carry                        # (1,G), (1,G), (1,F) fp32
        slot = c % 2

        @pl.when(c + 1 < n_chunks)
        def _():
            for cp in dma((c + 1) % 2, c + 1):
                cp.start()

        for cp in dma(slot, c):
            cp.wait()

        k = k_buf[slot]                          # (C, F) cache dtype
        v = v_buf[slot].astype(jnp.float32)
        idx = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
        in_range = (idx <= pos) & (idx >= start)               # (C, 1)

        m_out, l_out, acc_out = [], [], []
        for j in range(n_blk):                   # static unroll over stripes
            fs = slice(j * fblk, (j + 1) * fblk)
            gs = slice(j * gblk, (j + 1) * gblk)
            prod = q[:, fs].astype(k.dtype) * k[:, fs]         # (C, Fblk)
            logits = jnp.dot(prod, rc,
                             preferred_element_type=jnp.float32) * scale
            lo = hole_ref[0:1, gs]
            hi = hole_ref[1:2, gs]
            valid = in_range & ~((idx >= lo) & (idx < hi))     # (C, Gblk)
            logits = jnp.where(valid, logits, jnp.float32(-1e30))

            mj = m[:, gs]
            lj = l[:, gs]
            m_new = jnp.maximum(mj, jnp.max(logits, axis=0, keepdims=True))
            p = jnp.exp(logits - m_new) * valid                # (C, Gblk) fp32
            alpha = jnp.exp(mj - m_new)                        # (1, Gblk)
            l_out.append(lj * alpha + jnp.sum(p, axis=0, keepdims=True))
            m_out.append(m_new)
            p_full = jnp.dot(p.astype(k.dtype), rc.T,
                             preferred_element_type=jnp.float32)  # (C, Fblk)
            # the (1, Gblk) rescale row is tiny — keep it exact in fp32
            alpha_full = jnp.dot(alpha, r32.T,
                                 preferred_element_type=jnp.float32)
            acc_out.append(acc[:, fs] * alpha_full
                           + jnp.sum(p_full * v[:, fs], axis=0, keepdims=True))
        return (jnp.concatenate(m_out, axis=1),
                jnp.concatenate(l_out, axis=1),
                jnp.concatenate(acc_out, axis=1))

    g_total = f // head_dim
    m0 = jnp.full((1, g_total), -1e30, jnp.float32)
    l0 = jnp.zeros((1, g_total), jnp.float32)
    acc0 = jnp.zeros((1, f), jnp.float32)
    m, l, acc = jax.lax.fori_loop(c0, n_chunks, body, (m0, l0, acc0))

    if has_cur:
        # fold the CURRENT token's k/v row as a virtual height-1 final chunk:
        # the row is not yet in the HBM cache (deferred stacked insert — the
        # per-layer dynamic_update_slice chain was 434 us/step at B=2) so it
        # arrives as a VMEM operand instead. Same online-softmax arithmetic.
        kc_row = kcur_ref[:]                                   # (1, F)
        vc_row = vcur_ref[:].astype(jnp.float32)
        m_out, l_out, acc_out = [], [], []
        for j in range(n_blk):
            fs = slice(j * fblk, (j + 1) * fblk)
            gs = slice(j * gblk, (j + 1) * gblk)
            prod = q[:, fs].astype(kc_row.dtype) * kc_row[:, fs]
            logits = jnp.dot(prod, rc,
                             preferred_element_type=jnp.float32) * scale
            mj = m[:, gs]
            m_new = jnp.maximum(mj, logits)                    # (1, Gblk)
            p = jnp.exp(logits - m_new)
            alpha = jnp.exp(mj - m_new)
            l_out.append(l[:, gs] * alpha + p)
            m_out.append(m_new)
            p_full = jnp.dot(p.astype(kc_row.dtype), rc.T,
                             preferred_element_type=jnp.float32)
            alpha_full = jnp.dot(alpha, r32.T,
                                 preferred_element_type=jnp.float32)
            acc_out.append(acc[:, fs] * alpha_full
                           + p_full * vc_row[:, fs])
        m = jnp.concatenate(m_out, axis=1)
        l = jnp.concatenate(l_out, axis=1)
        acc = jnp.concatenate(acc_out, axis=1)

    l_parts = [jnp.dot(l[:, j * gblk:(j + 1) * gblk], r32.T,
                       preferred_element_type=jnp.float32)
               for j in range(n_blk)]
    out_ref[:] = (acc / jnp.concatenate(l_parts, axis=1)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     cache_pos: jnp.ndarray, start: jnp.ndarray | int = 0,
                     hole: jnp.ndarray | None = None,
                     interpret: bool | None = None,
                     layer: jnp.ndarray | int | None = None,
                     k_cur: jnp.ndarray | None = None,
                     v_cur: jnp.ndarray | None = None) -> jnp.ndarray:
    """q (B, H, D), k/v sequence-major -> (B, H, D).

    k/v accept TWO layouts:
      (Lc, B, H, D)            one layer's slab (the round-2/3 interface);
      (n_layers, Lc, B, H, D)  the WHOLE stacked cache with `layer` a traced
                               index — the kernel DMAs layer slabs straight
                               out of the stacked buffer, so the caller never
                               materialises a per-layer slice (a 2 MB copy
                               per layer per step, ~290 us/step at B=2).

    k_cur/v_cur (B, H, D): the CURRENT token's k/v row, folded in-kernel as
    a final height-1 chunk. With these present the HBM walk covers
    [start, cache_pos - 1] and the deferred row completes the softmax — the
    caller batches all layers' cache inserts into ONE update per step.
    Without them the walk covers [start, cache_pos] (row already inserted).

    Attends minus each row's optional `hole` (B, 2) int32 dead range
    [lo, hi) (ragged right-padded text). Lc must be a 256-multiple and
    B*H*D a multiple of 128.

    interpret=None auto-selects the Pallas interpreter on CPU backends so
    CHATTERBOX_PALLAS=1 drives the identical kernel code path in tests.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    b, h, d = q.shape
    if k.ndim == 4:
        k = k[None]
        v = v[None]
        layer = 0
    n_layers, lcache = k.shape[0], k.shape[1]
    assert layer is not None, "stacked cache needs a layer index"
    f = b * h * d
    assert lcache % 256 == 0, \
        f"cache length {lcache} must be a multiple of 256"
    assert f % 128 == 0, f"B*H*D={f} must be 128-aligned for TPU tiling"
    has_cur = k_cur is not None
    fblk = _feature_block(f, d)
    g_total = f // d
    gp = -(-g_total // 128) * 128               # lane-pad the hole vector
    pos_hist = jnp.asarray(cache_pos, jnp.int32).reshape(())
    if has_cur:
        pos_hist = pos_hist - 1
    pos = jnp.stack([pos_hist,
                     jnp.asarray(start, jnp.int32).reshape(()),
                     jnp.asarray(layer, jnp.int32).reshape(())])
    if hole is None:
        hole_g = jnp.zeros((2, gp), jnp.int32)
    else:
        # per-row [lo, hi) broadcast to the row's H head-groups
        hg = jnp.repeat(jnp.asarray(hole, jnp.int32).T, h, axis=1)  # (2, B*H)
        hole_g = jnp.pad(hg, ((0, 0), (0, gp - g_total)))
    if has_cur:
        kc_row = k_cur.reshape(1, f).astype(k.dtype)
        vc_row = v_cur.reshape(1, f).astype(v.dtype)
    else:
        kc_row = jnp.zeros((1, f), k.dtype)
        vc_row = jnp.zeros((1, f), v.dtype)
    chunk = _chunk_rows(f, k.dtype.itemsize, lcache)
    out = pl.pallas_call(
        functools.partial(_kernel, d, fblk, has_cur),
        out_shape=jax.ShapeDtypeStruct((1, f), q.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, f), k.dtype),
            pltpu.VMEM((2, chunk, f), v.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(pos, q.reshape(1, f), hole_g, kc_row, vc_row,
      k.reshape(n_layers, lcache, f), v.reshape(n_layers, lcache, f))
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
