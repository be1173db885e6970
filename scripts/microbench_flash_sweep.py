"""Sweep (row-block, CHUNK) for the flash-decode kernel, attention only.

Times decode_attention in a 64-step scan at serving shapes (full-size T3:
H=16, D=64, cache 1024) for b in {2, 16, 32} rows, against the XLA
reference einsum. Clears jit caches between configs so module-constant
overrides take effect.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_flash_sweep.py
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from chatterbox_embed_tpu.kernels import flash_decode as fd

H, D, TOTAL, START, STEPS = 16, 64, 1024, 64, 64


def time_attn(fn, q, k, v, steps=STEPS):
    @jax.jit
    def prog(q, k, v):
        def body(acc, i):
            out = fn(q + acc[:, :, :1] * 0, k, v, 300 + i)
            return acc + out.astype(acc.dtype), ()
        acc, _ = jax.lax.scan(body, jnp.zeros_like(q), jnp.arange(steps))
        return acc

    out = prog(q, k, v)
    jax.block_until_ready(out)
    t0 = time.time()
    out = prog(q, k, v)
    jax.block_until_ready(out)
    return (time.time() - t0) / steps * 1000.0


def main():
    rng = np.random.default_rng(0)
    results = {}
    for b in (2, 16, 32):
        q = jnp.asarray(rng.standard_normal((b, H, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((TOTAL, b, H, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((TOTAL, b, H, D)), jnp.bfloat16)

        def xla(qq, kk, vv, pos):
            return fd.decode_attention_reference(qq, kk, vv, pos, START)

        results[f"b{b}_xla_ms"] = time_attn(xla, q, k, v)
        print(f"[sweep] b{b} xla {results[f'b{b}_xla_ms']:.3f}", file=sys.stderr)

        for chunk in (128, 256, 512):
            for budget_mb in (8,):
                fd.CHUNK = chunk
                fd._BUF_BUDGET = budget_mb << 20
                fd.decode_attention.clear_cache()

                def flash(qq, kk, vv, pos):
                    return fd.decode_attention(qq, kk, vv, pos, START)

                rb = fd._row_block(b, H, D, 2)
                try:
                    ms = time_attn(flash, q, k, v)
                except Exception as e:  # noqa: BLE001
                    results[f"b{b}_flash_c{chunk}_err"] = str(e)[:120]
                    print(f"[sweep] b{b} flash c{chunk} ERR {e}", file=sys.stderr)
                    continue
                results[f"b{b}_flash_c{chunk}_rb{rb}_ms"] = ms
                print(f"[sweep] b{b} flash c{chunk} rb{rb} {ms:.3f}",
                      file=sys.stderr)
        fd.CHUNK = 256
        fd._BUF_BUDGET = 8 << 20
        fd.decode_attention.clear_cache()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
