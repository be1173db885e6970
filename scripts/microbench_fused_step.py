"""Fused monolithic decode-step kernel vs the per-op XLA/flash decode path.

Full-size Llama-520M, B=2 CFG rows, 1024-slot cache — the single-utterance
serving shape. Timing follows PERF_NOTES' tunnel traps: each measurement is
a scan of distinct steps (carry-varied inputs), ended with a device->host
fetch, at TWO scan lengths so the per-step slope cancels the RTT constant.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_fused_step.py
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from chatterbox_embed_tpu.config import LlamaConfig
from chatterbox_embed_tpu.models import llama
from chatterbox_embed_tpu.kernels import fused_decode
from chatterbox_embed_tpu.utils.device import init_on_cpu, to_default_device

CFG = LlamaConfig()
B, TOTAL, START, POS0 = 2, 1024, 0, 300
LENS = (128, 512)
USE_FLASH = jax.devices()[0].platform not in ("cpu",)
DTYPE = jnp.bfloat16


def time_prog(make_prog, *args):
    out = {}
    for steps in LENS:
        prog = make_prog(steps)
        r = prog(*args)
        jax.block_until_ready(r)
        np.asarray(r)                       # fetch barrier (trap #2)
        t0 = time.time()
        r = prog(*args)
        np.asarray(r)
        out[steps] = time.time() - t0
    slope = (out[LENS[1]] - out[LENS[0]]) / (LENS[1] - LENS[0])
    return slope * 1000.0, out


def main():
    k = jax.random.PRNGKey(0)
    print("[mb] init...", file=sys.stderr)
    params = init_on_cpu(llama.init, k, CFG)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                          if x.dtype == np.float32 else x, params)
    print("[mb] transfer...", file=sys.stderr)
    params = to_default_device(params)
    cache = llama.init_cache(CFG, B, TOTAL, DTYPE)
    x0 = jnp.zeros((B, CFG.hidden_size), DTYPE)
    results = {}

    def make_base(steps):
        @jax.jit
        def prog(params, ck, cv):
            def body(c, i):
                x, ck, cv = c
                pos = POS0 + i
                h, cache2 = llama.forward(
                    params, x[:, None], jnp.full((B, 1), pos, jnp.int32),
                    None, llama.KVCache(ck, cv), pos, CFG, DTYPE,
                    flash_decode=USE_FLASH, flash_start=START)
                return (h[:, 0].astype(DTYPE), cache2.k, cache2.v), ()
            (xf, _, _), _ = jax.lax.scan(body, (x0, ck, cv), jnp.arange(steps))
            return xf
        return prog

    results["base_ms"], results["base_raw"] = time_prog(
        make_base, params, cache.k, cache.v)
    print("[mb] base", results["base_ms"], file=sys.stderr)

    fused = fused_decode.stack_for_fused(params, CFG, DTYPE)
    jax.block_until_ready(fused)

    def make_fused(steps):
        @jax.jit
        def prog(fused, ck, cv):
            def body(c, i):
                x, ck, cv = c
                pos = POS0 + i
                h, ck, cv = fused_decode.fused_decode_step(
                    fused, x, ck, cv, pos, jnp.int32(START), CFG, dtype=DTYPE)
                return (h.astype(DTYPE), ck, cv), ()
            (xf, _, _), _ = jax.lax.scan(body, (x0, ck, cv), jnp.arange(steps))
            return xf
        return prog

    results["fused_ms"], results["fused_raw"] = time_prog(
        make_fused, fused, cache.k, cache.v)
    print("[mb] fused", results["fused_ms"], file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
