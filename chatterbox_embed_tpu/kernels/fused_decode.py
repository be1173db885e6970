"""Monolithic weight-streaming T3 decode step: the ENTIRE 30-layer
transformer token step as ONE Pallas kernel.

Why: the XLA decode step costs 2.31 ms at the 1.3 ms weight-streaming floor
(PERF_NOTES) — the residual ~0.7 ms is per-op overhead across ~400 small ops
in the loop body, not matmul or HBM time. scripts/microbench_weight_stream.py
measured the go/no-go: a 4-deep ring of 1 MB HBM->VMEM DMAs with a matvec
consume sustains 767 GB/s (94% of v5e peak) — 1.40 ms for the 1.06 GB bf16
backbone. This kernel rides that stream: one invocation walks every layer's
weights exactly once, double(4x)-buffered, with the token math (norms, RoPE,
cache-walk attention, MLP) computed in VMEM between DMA waits.

Layout: all four weight groups are stacked TRANSPOSED into one HBM "wall"
  wall[L, S, d], rows per layer: [qkv^T (3*qo) | o^T (d) | gate,up^T (2*I) | down (I)]
so every DMA block is a uniform (bc, d) slab (bc*d*2B ~ 1 MB) and every
matmul is dot_general(x (b,d), blk (bc,d), contract last-with-last) — an
out-column block of the original matmul. `down` is stored NATURAL (I, d):
its blocks are in-row slabs consumed as dot(m[:, rows], blk) partial sums.
(Requires qo == d, true for T3's 16x64 heads @ d=1024.)

In-kernel attention: the flash-decode chunk walk (kernels/flash_decode.py)
inlined — sequence-major cache (L, Lc, F=b*qo), fp32 streaming softmax over
slots [start, pos-1], then the CURRENT token's roped k/v (still in VMEM)
folded in as one extra flash term. The kernel READS the cache only; the new
row per layer is returned as a tiny (L, F) VMEM output and inserted by an
XLA dynamic_update_slice outside (in-place under the decode while_loop
carry, like the plain XLA path) — Mosaic cannot express a single-row HBM
write into an (8,128)-tiled cache memref.

RoPE without lane shuffles: rotate_half is a (d, d) +/-1 permutation, so
rope(x) = x*cos_t + (x @ P)*sin_t — one tiny MXU matmul instead of
unsupported per-head lane rolls (P is built once per call from iota).

Reference behavior mirrored: models/llama.py forward() t==1 decode path
(HF rotate-half RoPE llama.py:80-86, fp32 softmax, bf16 residuals).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import LlamaConfig

import os

# Geometry env vars are read ONCE at import time and baked into every
# compiled program (trace-time constants; the jit cache is not keyed on
# them).  Set CHATTERBOX_FUSED_{BC,NBUF,KV_CHUNK} BEFORE the first import,
# or monkeypatch the module attributes AND call
# fused_decode_step.__wrapped__ to bypass the jit cache (what
# scripts/sweep_fused_geometry.py and tests/test_fused_decode.py do).
_BC_TARGET = int(os.getenv("CHATTERBOX_FUSED_BC", "512"))   # wall block rows
_NBUF = int(os.getenv("CHATTERBOX_FUSED_NBUF", "4"))        # ring depth
_KV_CHUNK = int(os.getenv("CHATTERBOX_FUSED_KV_CHUNK", "128"))


def plan(cfg: LlamaConfig, b: int):
    """Static geometry. Returns None when the fused step cannot serve this
    config (the caller falls back to the XLA/flash path)."""
    d = cfg.hidden_size
    qo = cfg.num_heads * cfg.head_dim
    inter = cfg.intermediate_size
    if qo != d or cfg.num_kv_heads != cfg.num_heads:
        return None
    f = b * qo
    if f % 128 != 0 or d % 128 != 0:
        return None
    segs = (3 * qo, d, 2 * inter, inter)
    bc = _BC_TARGET
    while bc > 8 and any(s % bc for s in segs):
        bc //= 2
    if any(s % bc for s in segs):
        return None
    blocks = []          # (segment, static row offset) per wall block
    off = 0
    for si, s in enumerate(segs):
        for r in range(s // bc):
            blocks.append((si, off + r * bc))
        off += s
    return dict(d=d, qo=qo, inter=inter, h=cfg.num_heads, hd=cfg.head_dim,
                f=f, bc=bc, s_total=off, blocks=tuple(blocks),
                nq=3 * qo // bc, no=d // bc, ngu=2 * inter // bc,
                nd=inter // bc)


def _rot_p(d: int, hd: int, dtype):
    """(d, d) rotate-half permutation: y = x @ P ==
    concat(-x[half:], x[:half]) per hd-wide head group (llama.py:80-86)."""
    ia = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)     # x index
    ib = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)     # out index
    half = hd // 2
    neg = (ia == ib + half) & (ib % hd < half)
    pos = (ia == ib - half) & (ib % hd >= half)
    return (pos.astype(jnp.float32) - neg.astype(jnp.float32)).astype(dtype)


def _group_r(f: int, hd: int):
    """(F, G) 0/1 block-diagonal group-reduction matrix (flash_decode.py)."""
    g = f // hd
    r = (jax.lax.broadcasted_iota(jnp.int32, (f, g), 0) // hd
         == jax.lax.broadcasted_iota(jnp.int32, (f, g), 1))
    return r.astype(jnp.float32)


def _kernel(p, n_layers, eps, b,
            pos_ref, x_ref, cos_ref, sin_ref, ln1_ref, ln2_ref, fnorm_ref,
            wall_hbm, k_hbm, v_hbm,
            hout_ref, knew_ref, vnew_ref,
            ring, kbuf, vbuf,
            ring_sem, kv_sem):
    d, qo, inter = p["d"], p["qo"], p["inter"]
    hd, f, bc = p["hd"], p["f"], p["bc"]
    blocks = p["blocks"]
    nb = len(blocks)
    chunk = kbuf.shape[1]
    seg_off = (0, 3 * qo, 3 * qo + d, 3 * qo + d + 2 * inter)

    pos = pos_ref[0]
    start = pos_ref[1]
    wdtype = ring.dtype
    total_blocks = n_layers * nb

    def start_wall(layer, j, slot):
        """DMA wall block j of `layer` into ring[slot]."""
        _, row = blocks[j]
        pltpu.make_async_copy(wall_hbm.at[layer, pl.ds(row, bc)],
                              ring.at[slot], ring_sem.at[slot]).start()

    def wait_wall(slot):
        pltpu.make_async_copy(wall_hbm.at[0, pl.ds(0, bc)],
                              ring.at[slot], ring_sem.at[slot]).wait()

    def prefetch(i, j):
        """Start the DMA that is _NBUF-1 blocks ahead of (layer i, block j);
        j may index into the next layer (static wrap)."""
        g = i * nb + j
        slot = jax.lax.rem(g, _NBUF)
        if j < nb:
            start_wall(i, j, slot)
        else:
            @pl.when(i + 1 < n_layers)
            def _():
                start_wall(i + 1, j - nb, slot)

    # warm-up: first ring of layer 0 (static indices)
    for j in range(min(_NBUF - 1, nb)):
        start_wall(0, j, j)

    ahead = _NBUF - 1
    rot = _rot_p(d, hd, wdtype)                 # rotate-half permutation
    r32 = _group_r(f, hd)                       # (F, G) fp32
    rc = r32.astype(wdtype)
    g_total = f // hd
    scale = 1.0 / math.sqrt(hd)
    cos_t = cos_ref[:]                          # (1, d) fp32
    sin_t = sin_ref[:]

    def rmsnorm(h, s_ref, i):
        hf = h.astype(jnp.float32)
        var = jnp.mean(jnp.square(hf), axis=-1, keepdims=True)
        s = s_ref[pl.ds(i, 1), :]               # (1, d)
        return (hf * jax.lax.rsqrt(var + eps) * s).astype(h.dtype)

    def consume(i, j, x):
        """Wait for wall block (i, j), multiply: (b, d|bc) x blk -> (b, bc)
        out-column partial (or (b, d) in-row partial for `down`)."""
        prefetch(i, j + ahead)
        g = i * nb + j
        slot = jax.lax.rem(g, _NBUF)
        wait_wall(slot)
        blk = ring[slot]                        # (bc, d)
        si = blocks[j][0]
        if si < 3:                              # transposed: out-column block
            return jax.lax.dot_general(
                x, blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        return jnp.dot(x, blk, preferred_element_type=jnp.float32)

    def rope(x):                                # (b, qo) wdtype
        xr = jnp.dot(x, rot, preferred_element_type=jnp.float32)
        return (x.astype(jnp.float32) * cos_t + xr * sin_t).astype(x.dtype)

    def to_flat(rows):                          # (b, qo) -> (1, F) lane-major
        # row extraction via one-hot matvec: a direct rows[r:r+1] slice has
        # sublane offset r, and Mosaic rejects lane-concats whose operands
        # disagree on the non-concat (sublane) offset — iota-built selectors
        # sit at offset 0
        ib = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
        return jnp.concatenate(
            [jnp.dot((ib == r).astype(rows.dtype), rows,
                     preferred_element_type=jnp.float32).astype(rows.dtype)
             for r in range(b)], axis=1)

    def to_rows(flat):                          # (1, F) -> (b, qo)
        return jnp.concatenate(
            [flat[:, r * qo:(r + 1) * qo] for r in range(b)], axis=0)

    def layer_cache_dma(i, slot, c):
        return [pltpu.make_async_copy(k_hbm.at[i, pl.ds(c * chunk, chunk)],
                                      kbuf.at[slot], kv_sem.at[slot, 0]),
                pltpu.make_async_copy(v_hbm.at[i, pl.ds(c * chunk, chunk)],
                                      vbuf.at[slot], kv_sem.at[slot, 1])]

    def attention(i, q_flat, k_flat, v_flat):
        """Flash walk over cache slots [start, pos-1] + the in-VMEM current
        token term. Returns (1, F) fp32 normalized context."""
        c0 = start // chunk
        n_chunks = (pos - 1 + chunk) // chunk   # walk excludes slot `pos`
        for cp in layer_cache_dma(i, c0 % 2, c0):
            cp.start()

        def body(c, carry):
            m, l, acc = carry
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < n_chunks)
            def _():
                for cp in layer_cache_dma(i, (c + 1) % 2, c + 1):
                    cp.start()
            for cp in layer_cache_dma(i, slot, c):
                cp.wait()
            k = kbuf[slot]
            v = vbuf[slot].astype(jnp.float32)
            idx = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
            valid = (idx <= pos - 1) & (idx >= start)
            prod = q_flat.astype(k.dtype) * k
            logits = jnp.dot(prod, rc, preferred_element_type=jnp.float32) * scale
            logits = jnp.where(valid, logits, jnp.float32(-1e30))
            m_new = jnp.maximum(m, jnp.max(logits, axis=0, keepdims=True))
            pr = jnp.exp(logits - m_new) * valid
            alpha = jnp.exp(m - m_new)
            l_new = l * alpha + jnp.sum(pr, axis=0, keepdims=True)
            p_full = jnp.dot(pr.astype(k.dtype), rc.T,
                             preferred_element_type=jnp.float32)
            alpha_full = jnp.dot(alpha, r32.T, preferred_element_type=jnp.float32)
            acc_new = acc * alpha_full + jnp.sum(p_full * v, axis=0, keepdims=True)
            return m_new, l_new, acc_new

        m0 = jnp.full((1, g_total), -1e30, jnp.float32)
        l0 = jnp.zeros((1, g_total), jnp.float32)
        a0 = jnp.zeros((1, f), jnp.float32)
        m, l, acc = jax.lax.fori_loop(c0, n_chunks, body, (m0, l0, a0))

        # current-token term (k/v still in VMEM — the cache row at `pos` is
        # inserted by the caller after the kernel and is never read here)
        prod = (q_flat.astype(wdtype) * k_flat.astype(wdtype))
        l_cur = jnp.dot(prod, rc, preferred_element_type=jnp.float32) * scale
        m_f = jnp.maximum(m, l_cur)
        p_cur = jnp.exp(l_cur - m_f)            # (1, G)
        alpha = jnp.exp(m - m_f)
        l_f = l * alpha + p_cur
        p_cur_full = jnp.dot(p_cur, r32.T, preferred_element_type=jnp.float32)
        alpha_full = jnp.dot(alpha, r32.T, preferred_element_type=jnp.float32)
        acc = acc * alpha_full + p_cur_full * v_flat.astype(jnp.float32)
        l_full = jnp.dot(l_f, r32.T, preferred_element_type=jnp.float32)
        return acc / (l_full + 1e-30)

    def layer(i, carry):
        h, kacc, vacc = carry
        xn = rmsnorm(h, ln1_ref, i)
        parts = [consume(i, j, xn) for j in range(p["nq"])]
        qkv = jnp.concatenate(parts, axis=1)               # (b, 3*qo) fp32
        q = rope(qkv[:, :qo].astype(wdtype))
        k = rope(qkv[:, qo:2 * qo].astype(wdtype))
        v = qkv[:, 2 * qo:].astype(wdtype)

        q_flat = to_flat(q)
        k_flat = to_flat(k)
        v_flat = to_flat(v)
        # collect the new row for layer i via one-hot accumulate (a direct
        # knew_ref[pl.ds(i, 1)] store needs an 8-aligned dynamic sublane
        # offset, and an (L,1) i1 where-mask hits a Mosaic relayout bug —
        # a full 2D iota mask multiply lowers cleanly)
        sel = (jax.lax.broadcasted_iota(jnp.int32, (n_layers, f), 0) == i
               ).astype(kacc.dtype)
        kacc = kacc + sel * k_flat.astype(kacc.dtype)
        vacc = vacc + sel * v_flat.astype(vacc.dtype)

        att = attention(i, q_flat, k_flat, v_flat)         # (1, F) fp32
        att_rows = to_rows(att).astype(wdtype)             # (b, qo)

        j0 = p["nq"]
        o_parts = [consume(i, j0 + j, att_rows) for j in range(p["no"])]
        h = h + jnp.concatenate(o_parts, axis=1).astype(h.dtype)

        xn2 = rmsnorm(h, ln2_ref, i)
        j1 = j0 + p["no"]
        gu_parts = [consume(i, j1 + j, xn2) for j in range(p["ngu"])]
        gu = jnp.concatenate(gu_parts, axis=1)             # (b, 2*I) fp32
        # silu in fp32: Mosaic's logistic lowering broadcasts an f32 scalar
        # and cannot verify it into a bf16 vector
        mm = (jax.nn.silu(gu[:, :inter]) * gu[:, inter:]).astype(wdtype)

        j2 = j1 + p["ngu"]
        dacc = jnp.zeros((b, d), jnp.float32)
        for j in range(p["nd"]):
            dacc = dacc + consume(i, j2 + j, mm[:, j * bc:(j + 1) * bc])
        h = h + dacc.astype(h.dtype)
        return h, kacc, vacc

    kv0 = jnp.zeros((n_layers, f), knew_ref.dtype)
    h, kacc, vacc = jax.lax.fori_loop(0, n_layers, layer,
                                      (x_ref[:], kv0, kv0))
    knew_ref[:] = kacc
    vnew_ref[:] = vacc
    hf = h.astype(jnp.float32)
    var = jnp.mean(jnp.square(hf), axis=-1, keepdims=True)
    hout_ref[:] = (hf * jax.lax.rsqrt(var + eps) * fnorm_ref[:]
                   ).astype(hout_ref.dtype)


def stack_for_fused(llama_params, cfg: LlamaConfig, dtype=jnp.bfloat16):
    """Restack the per-layer param dicts into the kernel's wall layout.
    One device-side jit at model-load time (~1 GB concat)."""
    @jax.jit
    def _build(lp):
        walls, ln1s, ln2s = [], [], []
        for layer in lp["layers"]:
            rows = [layer["q"]["w"].T, layer["k"]["w"].T, layer["v"]["w"].T,
                    layer["o"]["w"].T, layer["gate"]["w"].T, layer["up"]["w"].T,
                    layer["down"]["w"]]
            walls.append(jnp.concatenate([r.astype(dtype) for r in rows], axis=0))
            ln1s.append(layer["ln1"]["scale"].astype(jnp.float32))
            ln2s.append(layer["ln2"]["scale"].astype(jnp.float32))
        return {"wall": jnp.stack(walls),
                "ln1": jnp.stack(ln1s), "ln2": jnp.stack(ln2s),
                "fnorm": lp["norm"]["scale"].astype(jnp.float32)[None, :]}
    return _build(llama_params)


@functools.partial(jax.jit, static_argnames=("cfg", "dtype", "interpret"))
def fused_decode_step(fused, x, cache_k, cache_v, cache_pos, start,
                      cfg: LlamaConfig, dtype=jnp.bfloat16,
                      interpret: bool | None = None):
    """One token step for B rows. x (B, d) compute-dtype; cache_k/v
    sequence-major (L_layers, Lc, B, H, D). Returns (h (B, d) post-norm,
    new cache_k, cache_v).  The caches alias in place ONLY under
    decode_block's donated while_loop carry; a standalone call (tests,
    microbenches) copies both full (L, Lc, B, H, D) buffers per step.

    Fallback conditions are the caller's job (plan(cfg, b) is not None,
    Lc % _KV_CHUNK == 0)."""
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    b, d = x.shape
    p = plan(cfg, b)
    assert p is not None, "fused_decode_step: unsupported config"
    n_layers, lc = cache_k.shape[0], cache_k.shape[1]
    f = p["f"]
    assert lc % _KV_CHUNK == 0, lc

    # rope cos/sin for this position, tiled across heads (1, d)
    pos_scalar = jnp.asarray(cache_pos, jnp.int32).reshape(()) - jnp.asarray(
        start, jnp.int32).reshape(())
    from ..models.llama import _scaled_inv_freq
    inv = jnp.asarray(_scaled_inv_freq(cfg))
    ang = pos_scalar.astype(jnp.float32) * inv               # (hd/2,)
    ang = jnp.concatenate([ang, ang])                        # (hd,)
    cos_t = jnp.tile(jnp.cos(ang), cfg.num_heads)[None, :]   # (1, d)
    sin_t = jnp.tile(jnp.sin(ang), cfg.num_heads)[None, :]

    pos2 = jnp.stack([jnp.asarray(cache_pos, jnp.int32).reshape(()),
                      jnp.asarray(start, jnp.int32).reshape(())])
    kf = cache_k.reshape(n_layers, lc, f)
    vf = cache_v.reshape(n_layers, lc, f)

    kernel = functools.partial(_kernel, p, n_layers,
                               float(cfg.rms_norm_eps), b)
    hout, knew, vnew = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((b, d), dtype),
                   jax.ShapeDtypeStruct((n_layers, f), kf.dtype),
                   jax.ShapeDtypeStruct((n_layers, f), vf.dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((_NBUF, p["bc"], d), fused["wall"].dtype),
            pltpu.VMEM((2, _KV_CHUNK, f), kf.dtype),
            pltpu.VMEM((2, _KV_CHUNK, f), vf.dtype),
            pltpu.SemaphoreType.DMA((_NBUF,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(pos2, x.astype(dtype), cos_t, sin_t, fused["ln1"], fused["ln2"],
      fused["fnorm"], fused["wall"], kf, vf)
    pos_i = jnp.asarray(cache_pos, jnp.int32).reshape(())
    k2 = jax.lax.dynamic_update_slice(kf, knew[:, None, :],
                                      (jnp.int32(0), pos_i, jnp.int32(0)))
    v2 = jax.lax.dynamic_update_slice(vf, vnew[:, None, :],
                                      (jnp.int32(0), pos_i, jnp.int32(0)))
    return (hout,
            k2.reshape(cache_k.shape), v2.reshape(cache_v.shape))
