"""Sweep fused decode-step kernel geometry on the real TPU with device-side
zero weights (no tunnel transfer). Slope timing per PERF_NOTES traps.

Round-3 verdict (PERF_NOTES "monolithic fused decode step"): ~2.70 ms/step
across bc 512/1024, nbuf 2-8, kv_chunk 128/256 — geometry-invariant, the
kernel is serial-compute bound at B=2 rows and loses to the 2.61 ms per-op
path. bc=1024 needs nbuf<=3 (VMEM). Edit the config list at the bottom to
re-sweep; numbers are slope-timed (two scan lengths) so the tunnel RTT and
memoization traps don't contaminate them.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/sweep_fused_geometry.py
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from chatterbox_embed_tpu.config import LlamaConfig
from chatterbox_embed_tpu.kernels import fused_decode

CFG = LlamaConfig()
B, TOTAL, START, POS0 = 2, 1024, 0, 300
LENS = (128, 512)
DTYPE = jnp.bfloat16
d = CFG.hidden_size

p0 = fused_decode.plan(CFG, B)
fused = {
    "wall": jnp.zeros((CFG.num_layers, p0["s_total"], d), DTYPE),
    "ln1": jnp.ones((CFG.num_layers, d), jnp.float32),
    "ln2": jnp.ones((CFG.num_layers, d), jnp.float32),
    "fnorm": jnp.ones((1, d), jnp.float32),
}
ck = jnp.zeros((CFG.num_layers, TOTAL, B, CFG.num_kv_heads, CFG.head_dim), DTYPE)
cv = jnp.zeros_like(ck)
x0 = jnp.zeros((B, d), DTYPE)


def make_fused(steps):
    @jax.jit
    def prog(fused, ck, cv):
        def body(c, i):
            x, ck, cv = c
            h, ck, cv = fused_decode.fused_decode_step.__wrapped__(
                fused, x, ck, cv, POS0 + i, jnp.int32(START), CFG, dtype=DTYPE, interpret=False)
            return (h.astype(DTYPE), ck, cv), ()
        (xf, _, _), _ = jax.lax.scan(body, (x0, ck, cv), jnp.arange(steps))
        return xf
    return prog


def time_cfg(nbuf, bc, kvchunk):
    fused_decode._NBUF = nbuf
    fused_decode._BC_TARGET = bc
    fused_decode._KV_CHUNK = kvchunk
    out = {}
    for steps in LENS:
        prog = make_fused(steps)
        r = prog(fused, ck, cv)
        np.asarray(r)
        t0 = time.time()
        r = prog(fused, ck, cv)
        np.asarray(r)
        out[steps] = time.time() - t0
    slope = (out[LENS[1]] - out[LENS[0]]) / (LENS[1] - LENS[0])
    return slope * 1000.0, out


results = {}
for nbuf, bc, kvc in [(2, 1024, 128), (3, 1024, 128), (2, 1024, 256), (2, 512, 128)]:
    key = f"nbuf{nbuf}_bc{bc}_kv{kvc}"
    try:
        ms, raw = time_cfg(nbuf, bc, kvc)
        results[key] = ms
        print(f"[sweep] {key}: {ms:.3f} ms/step {raw}", file=sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001
        results[key] = f"FAIL {type(e).__name__}: {str(e)[:200]}"
        print(f"[sweep] {key}: FAILED {str(e)[:300]}", file=sys.stderr, flush=True)
print(json.dumps(results))
