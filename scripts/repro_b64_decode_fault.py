"""Minimal repro: B=64-row single-token decode inside a while_loop faults the
TPU runtime on v5e (PERF_NOTES.md B=64 study; the reason t3.MAX_DECODE_UTTERANCES=16).

Observed behavior (v5e via remote runtime, libtpu of 2026-01):
  - ONE un-looped decode step at B=64 rows *runs* but at ~1.9 s/step
    (~100x expected — some pathological lowering kicks in);
  - the SAME step wrapped in lax.while_loop hard-faults the TPU worker;
  - B<=32 rows (16 utterances with CFG) is fast and stable;
  - ruled out: the sequence-major cache transpose (a transpose-free
    variant faults identically).

The fused batch dim is capped at 16 utterances (32 CFG rows) per program in
t3.generate_batch; scale-out beyond that is the dp mesh path
(parallel/serve.py), which shards rows across chips and keeps per-chip B low.

DANGER: running this WILL likely kill the TPU worker / tunnel session, so it
refuses to run without REPRO_B64=1. File alongside any libtpu bug report.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

if os.getenv("REPRO_B64") != "1":
    print("refusing to run (this faults the TPU worker); set REPRO_B64=1",
          file=sys.stderr)
    sys.exit(0)

import jax
import jax.numpy as jnp

from chatterbox_embed_tpu.config import LlamaConfig
from chatterbox_embed_tpu.models import llama
from chatterbox_embed_tpu.utils.device import init_on_cpu, to_default_device

B = int(os.getenv("REPRO_B", "64"))
CFG = LlamaConfig()
TOTAL = 512

params = to_default_device(jax.tree.map(
    lambda x: x.astype(jnp.bfloat16) if x.dtype == np.float32 else x,
    init_on_cpu(llama.init, jax.random.PRNGKey(0), CFG)))
cache = llama.init_cache(CFG, B, TOTAL, jnp.bfloat16)
x = jnp.zeros((B, 1, CFG.hidden_size), jnp.bfloat16)


@jax.jit
def one_step(params, x, cache):
    h, cache = llama.forward(params, x, jnp.full((B, 1), 40, jnp.int32),
                             None, cache, 40, CFG, jnp.bfloat16)
    return h, cache


@jax.jit
def looped(params, x, cache):
    def body(c, i):
        xx, cache = c
        h, cache = llama.forward(params, xx, jnp.full((B, 1), 40 + i, jnp.int32),
                                 None, cache, 40 + i, CFG, jnp.bfloat16)
        return (h.astype(jnp.bfloat16), cache), ()
    (h, cache), _ = jax.lax.scan(body, (x, cache), jnp.arange(8))
    return h


print(f"[repro] B={B}: single un-looped step...", file=sys.stderr)
t0 = time.time()
h, cache2 = one_step(params, x, cache)
jax.block_until_ready(h)
print(f"[repro] single step OK in {time.time() - t0:.2f}s "
      f"(expect ~100x slowdown at B=64)", file=sys.stderr)

print(f"[repro] B={B}: 8 steps inside lax.scan (this is the faulting case)...",
      file=sys.stderr)
t0 = time.time()
h = looped(params, x, cache)
jax.block_until_ready(h)
print(f"[repro] looped OK in {time.time() - t0:.2f}s — fault NOT reproduced "
      f"(fixed libtpu?)", file=sys.stderr)
