"""Go/no-go for a monolithic weight-streaming decode kernel: measure the
effective HBM->VMEM bandwidth of a double/quad-buffered weight walk with a
matvec consume, vs slab size and buffer depth.

Context (PERF_NOTES round-3 anatomy): the flash-decode chunk walk reaches
~370 GB/s on 2 MB slabs. XLA's whole decode step reads the 1.06 GB bf16
backbone in 2.31 ms => ~460 GB/s effective. A monolithic weight-streaming
step kernel only beats XLA if bigger slabs / deeper buffering push the DMA
stream meaningfully past 460 GB/s (v5e HBM peak ~819 GB/s). int8 halves the
bytes, so the same GB/s at int8 means ~2x fewer ms.

The consume is a (8, 1024) x (1024, R) matvec per slab (the B=2 CFG decode
rows sublane-padded to 8) — FLOP-negligible, bandwidth-dominated, exactly
the monolithic kernel's duty cycle.

Timing per PERF_NOTES "timing traps": fresh inputs each timed call, a
device->host fetch as the only reliable barrier, two scan lengths with the
per-step cost taken from the SLOPE (subtracts the RTT constant).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_weight_stream.py
"""
from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 1024                       # backbone hidden size
TOTAL_MB = 1024                # ~the 1.06 GB bf16 backbone


def _kernel(nbuf, x_ref, w_hbm, out_ref, w_buf, acc_ref, sems):
    n_chunks = w_hbm.shape[0]
    rows = w_hbm.shape[1]

    def dma(slot, c):
        return pltpu.make_async_copy(w_hbm.at[c], w_buf.at[slot],
                                     sems.at[slot])

    for c in range(nbuf - 1):
        dma(c, c).start()

    x = x_ref[:]                                     # (8, D)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(c, _):
        slot = c % nbuf

        @pl.when(c + nbuf - 1 < n_chunks)
        def _():
            dma((c + nbuf - 1) % nbuf, c + nbuf - 1).start()

        dma(slot, c).wait()
        w = w_buf[slot]                              # (R, D)
        if w.dtype == jnp.int8:
            y = jnp.dot(x.astype(jnp.int8), w.T,
                        preferred_element_type=jnp.int32).astype(jnp.float32)
        else:
            y = jnp.dot(x.astype(w.dtype), w.T,
                        preferred_element_type=jnp.float32)   # (8, R)
        acc_ref[:] += jnp.sum(y.reshape(8, rows // 128, 128), axis=1)
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)
    out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("nbuf",))
def stream_once(x, w, nbuf):
    rows = w.shape[1]
    return pl.pallas_call(
        functools.partial(_kernel, nbuf),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((nbuf, rows, D), w.dtype),
                        pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((nbuf,))],
    )(x, w)


def time_config(w, x0, nbuf, total_bytes):
    @functools.partial(jax.jit, static_argnames=("steps",))
    def prog(x, w, steps):
        def body(carry, _):
            out = stream_once(carry, w, nbuf)
            nxt = (carry + jnp.tile(out, (1, D // 128)).astype(carry.dtype)
                   * jnp.bfloat16(1e-6))
            return nxt, ()
        acc, _ = jax.lax.scan(body, x, jnp.arange(steps))
        return acc

    np.asarray(prog(x0, w, 8))                       # compile + warm
    times = {}
    for steps in (8, 32):
        best = float("inf")
        for j in (1, 2):
            xj = x0 + jnp.bfloat16(0.001 * j)
            t0 = time.time()
            np.asarray(prog(xj, w, steps))
            best = min(best, time.time() - t0)
        times[steps] = best
    per_step = (times[32] - times[8]) / 24.0
    gbs = total_bytes / per_step / 1e9
    return per_step * 1e3, gbs


@functools.partial(jax.jit, static_argnames=("n_chunks", "rows", "dtype"))
def _make_w(n_chunks, rows, dtype):
    """Device-side weight fill (host gen + tunnel transfer of 1 GB would
    take minutes; the DMA stream doesn't care about the values). A mild
    value spread keeps any value-dependent DMA compression honest-ish."""
    col = jax.lax.broadcasted_iota(jnp.int32, (n_chunks * rows, D), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (n_chunks * rows, D), 0)
    v = ((col * 40503 + row * 9973) & 255) - 128
    if dtype == jnp.int8:
        return v.astype(jnp.int8).reshape(n_chunks, rows, D)
    return (v.astype(jnp.float32) * (1.0 / 128.0)).astype(dtype).reshape(
        n_chunks, rows, D)


def main():
    rng = np.random.default_rng(0)
    results = {}
    for dtype, tag in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
        itemsize = 2 if tag == "bf16" else 1
        total_bytes = TOTAL_MB << 20 if tag == "bf16" else TOTAL_MB << 19
        for slab_mb, nbuf in ((1, 2), (1, 4), (2, 2), (2, 4), (4, 2)):
            rows = (slab_mb << 20) // (D * itemsize)
            n_chunks = total_bytes // (slab_mb << 20)
            w = _make_w(n_chunks, rows, dtype)
            x0 = jnp.asarray(rng.standard_normal((8, D)), jnp.bfloat16)
            ms, gbs = time_config(w, x0, nbuf, total_bytes)
            key = f"{tag}_slab{slab_mb}MB_nbuf{nbuf}"
            results[key] = {"ms_per_pass": round(ms, 3), "GBps": round(gbs, 1)}
            print(f"[wstream] {key}: {ms:.3f} ms/pass  {gbs:.0f} GB/s",
                  file=sys.stderr)
            del w
            if tag == "int8" and slab_mb == 2:
                break                      # int8: the two informative points
    print(json.dumps(results))


if __name__ == "__main__":
    main()
