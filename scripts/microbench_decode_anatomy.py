"""Decompose the flash-decode kernel's per-step cost on the real device.

Round-3 finding (PERF_NOTES): the chunk walk costs ~25-35 us per iteration
and ~50 us per invocation regardless of slab size — not HBM-BW, not MXU.
This bench separates the suspects by timing VARIANTS of the same kernel in
a 256-step scan (output feeds the next query, so nothing is elided; two
different-input calls are timed so the remote backend cannot memoize):

  full_1chunk   the real kernel at pos inside the first chunk
  full_nchunk   the real kernel at pos spanning N chunks
  dma_only      DMA walk + trivial consume, no attention math
  compute_only  attention math on a resident slab, no DMA walk

(full_n - full_1) / (N-1) = marginal per-chunk cost; dma_only isolates the
DMA machinery; compute_only isolates the VPU/MXU math + invocation glue.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_decode_anatomy.py
"""
from __future__ import annotations

import functools
import json
import math
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, D, TOTAL = 16, 16, 64, 1024          # batch-8 CFG rows (gate edge)
F = B * H * D
CHUNK = 64                                  # what _chunk_rows picks at this F
FBLK = 4096
STEPS = 1024


def _variant_kernel(mode: str, pos_ref, q_ref, k_hbm, v_hbm, out_ref,
                    k_buf, v_buf, sems):
    f = q_ref.shape[1]
    n_blk = f // FBLK
    gblk = FBLK // D
    pos = pos_ref[0]
    n_chunks = (pos + CHUNK) // CHUNK
    scale = 1.0 / math.sqrt(D)
    q = q_ref[:]
    r32 = (jax.lax.broadcasted_iota(jnp.int32, (FBLK, gblk), 0) // D
           == jax.lax.broadcasted_iota(jnp.int32, (FBLK, gblk), 1)
           ).astype(jnp.float32)
    rc = r32.astype(k_buf.dtype)

    def dma(slot, c):
        return [pltpu.make_async_copy(k_hbm.at[pl.ds(c * CHUNK, CHUNK)],
                                      k_buf.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(v_hbm.at[pl.ds(c * CHUNK, CHUNK)],
                                      v_buf.at[slot], sems.at[slot, 1])]

    if mode != "compute_only":
        for cp in dma(0, 0):
            cp.start()

    def compute(k, v, m, l, acc, c):
        idx = c * CHUNK + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        in_range = idx <= pos
        m_out, l_out, acc_out = [], [], []
        for j in range(n_blk):
            fs = slice(j * FBLK, (j + 1) * FBLK)
            gs = slice(j * gblk, (j + 1) * gblk)
            prod = q[:, fs].astype(k.dtype) * k[:, fs]
            logits = jnp.dot(prod, rc, preferred_element_type=jnp.float32) * scale
            logits = jnp.where(in_range, logits, jnp.float32(-1e30))
            mj, lj = m[:, gs], l[:, gs]
            m_new = jnp.maximum(mj, jnp.max(logits, axis=0, keepdims=True))
            p = jnp.exp(logits - m_new) * in_range
            alpha = jnp.exp(mj - m_new)
            l_out.append(lj * alpha + jnp.sum(p, axis=0, keepdims=True))
            m_out.append(m_new)
            p_full = jnp.dot(p.astype(k.dtype), rc.T,
                             preferred_element_type=jnp.float32)
            alpha_full = jnp.dot(alpha, r32.T, preferred_element_type=jnp.float32)
            acc_out.append(acc[:, fs] * alpha_full
                           + jnp.sum(p_full * v[:, fs], axis=0, keepdims=True))
        return (jnp.concatenate(m_out, axis=1), jnp.concatenate(l_out, axis=1),
                jnp.concatenate(acc_out, axis=1))

    g_total = f // D
    m0 = jnp.full((1, g_total), -1e30, jnp.float32)
    l0 = jnp.zeros((1, g_total), jnp.float32)
    acc0 = jnp.zeros((1, f), jnp.float32)

    def body(c, carry):
        m, l, acc = carry
        slot = c % 2
        if mode == "compute_only":
            return compute(k_buf[0], v_buf[0].astype(jnp.float32), m, l, acc, c)

        @pl.when(c + 1 < n_chunks)
        def _():
            for cp in dma((c + 1) % 2, c + 1):
                cp.start()
        for cp in dma(slot, c):
            cp.wait()
        if mode == "dma_only":
            # consume one row so the walk cannot be dead-code-eliminated
            consume = (k_buf[slot][:1].astype(jnp.float32)
                       + v_buf[slot][:1].astype(jnp.float32))
            return m, l, acc + consume
        k = k_buf[slot]
        v = v_buf[slot].astype(jnp.float32)
        return compute(k, v, m, l, acc, c)

    m, l, acc = jax.lax.fori_loop(0, n_chunks, body, (m0, l0, acc0))
    if mode == "dma_only":
        out_ref[:] = acc.astype(out_ref.dtype)
        return
    l_parts = [jnp.dot(l[:, j * gblk:(j + 1) * gblk], r32.T,
                       preferred_element_type=jnp.float32)
               for j in range(f // FBLK)]
    out_ref[:] = (acc / (jnp.concatenate(l_parts, axis=1) + 1e-9)
                  ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("mode",))
def attn(q, k, v, cache_pos, mode):
    pos = jnp.asarray(cache_pos, jnp.int32).reshape(1)
    out = pl.pallas_call(
        functools.partial(_variant_kernel, mode),
        out_shape=jax.ShapeDtypeStruct((1, F), q.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, CHUNK, F), k.dtype),
                        pltpu.VMEM((2, CHUNK, F), v.dtype),
                        pltpu.SemaphoreType.DMA((2, 2))],
    )(pos, q.reshape(1, F), k.reshape(TOTAL, F), v.reshape(TOTAL, F))
    return out


def time_variant(mode, pos, k, v, q0):
    # the remote backend MEMOIZES identical (program, input) executions when
    # inputs are small enough to fingerprint — every timed call gets FRESH
    # input values, and the 1024-step scan makes the signal dominate the
    # tunnel RTT jitter; output feeds the next query so steps cannot be
    # elided
    @jax.jit
    def prog(q, k, v):
        def body(acc, i):
            out = attn(acc, k, v, pos, mode)
            return out.astype(acc.dtype), ()
        acc, _ = jax.lax.scan(body, q, jnp.arange(STEPS))
        return acc

    # block_until_ready alone is NOT a reliable completion barrier on the
    # remote backend — only fetching result bytes provably waits for the
    # computation. Every timed call uses fresh inputs and ends with a small
    # device->host fetch; all variants pay the same fetch RTT.
    np.asarray(prog(q0, k, v)[:, :128])                   # compile + warm
    best = float("inf")
    for j in (1, 2, 3):
        qj = q0 + float(j)
        t0 = time.time()
        np.asarray(prog(qj, k, v)[:, :128])
        best = min(best, time.time() - t0)
    return best / STEPS * 1e6                             # us/step


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, F)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((TOTAL, F)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((TOTAL, F)), jnp.bfloat16)
    results = {}
    global STEPS
    for steps in (1024, 4096):
        STEPS = steps
        for mode in ("full", "dma_only", "compute_only"):
            for pos, tag in ((44, "1chunk"), (379, "6chunk")):
                us = time_variant(mode, pos, k, v, q)
                results[f"{mode}_{tag}_s{steps}_us"] = round(us, 1)
                print(f"[anat] {mode} {tag} steps{steps}: {us:.1f} us/step",
                      file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
