"""Batched decode-attention microbench: multi-row flash kernel vs XLA.

Round-2 left batched T3 decode on XLA attention (the kernel only fit the
single-utterance CFG pair); the round-3 kernel grids over row blocks.
This measures the full decode step (weights + attention) per step at the
serving batch shapes, flash vs XLA, plus the ragged-hole variant.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_batch_decode.py
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
from chatterbox_embed_tpu.utils.device import init_on_cpu, to_default_device

CFG = LlamaConfig()
TOTAL, START, STEPS = 1024, 64, 64


def run_loop(params, cache, b, use_flash, hole=None, steps=STEPS):
    x0 = jnp.zeros((b, 1, CFG.hidden_size), jnp.bfloat16)

    @jax.jit
    def prog(params, cache, hole):
        def body(c, i):
            x, cache = c
            pos = jnp.full((b, 1), 300 + i, jnp.int32)
            if use_flash:
                h, cache = llama.forward(params, x, pos, None, cache, 300 + i,
                                         CFG, jnp.bfloat16, flash_decode=True,
                                         flash_start=START, flash_hole=hole)
            else:
                lmask = ((jnp.arange(TOTAL)[None, None, :] <= 300 + i)
                         & (jnp.arange(TOTAL)[None, None, :] >= START))
                h, cache = llama.forward(params, x, pos, lmask, cache, 300 + i,
                                         CFG, jnp.bfloat16)
            return (h.astype(jnp.bfloat16), cache), ()
        (xf, cache2), _ = jax.lax.scan(body, (x0, cache), jnp.arange(steps))
        return xf

    out = prog(params, cache, hole)  # compile
    jax.block_until_ready(out)
    t0 = time.time()
    out = prog(params, cache, hole)
    jax.block_until_ready(out)
    return (time.time() - t0) / steps * 1000.0


def main():
    k = jax.random.PRNGKey(0)
    print("[mb] init...", file=sys.stderr)
    params = init_on_cpu(llama.init, k, CFG)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                          if x.dtype == np.float32 else x, params)
    print("[mb] transfer...", file=sys.stderr)
    params = to_default_device(params)
    results = {}
    # flash first: the b=32 XLA variant can fault the worker (the known
    # large-fused-batch libtpu issue) and must not sink the other configs
    for b in (2, 4, 8, 16):
        for use_flash in (True, False):
            tag = f"b{b}_{'flash' if use_flash else 'xla'}_ms"
            try:
                cache = llama.init_cache(CFG, b, TOTAL, jnp.bfloat16)
                results[tag] = run_loop(params, cache, b, use_flash)
                print(f"[mb] {tag}", results[tag], file=sys.stderr)
            except Exception as e:  # noqa: BLE001
                results[tag + "_err"] = str(e)[:120]
                print(f"[mb] {tag} ERR {e}", file=sys.stderr)
    # ragged holes at batch 16 (32 CFG rows)
    b = 32
    try:
        cache = llama.init_cache(CFG, b, TOTAL, jnp.bfloat16)
        hole = jnp.stack([jnp.full((b,), 100, jnp.int32),
                          jnp.full((b,), 150, jnp.int32)], axis=1)
        results["b32_flash_hole_ms"] = run_loop(params, cache, b, True, hole)
        print("[mb] b32 flash+hole", results["b32_flash_hole_ms"], file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        results["b32_flash_hole_err"] = str(e)[:120]
    print(json.dumps(results))


if __name__ == "__main__":
    main()
