"""Conformer encoder microbench on the real device: rel-pos attention cost.

The rel-attention materialises ac (B,H,T,T) + bd_full (B,H,T,2T-1) + combined
logits in fp32 per block (10 blocks). The flash path keeps ac/logits/softmax
in VMEM and materialises only the shifted bd bias. Measures full-size encoder
at batch-8-equivalent shapes and checks flash-vs-XLA parity with ragged lens.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_conformer.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from chatterbox_embed_tpu.config import ConformerConfig
from chatterbox_embed_tpu.models import conformer as cf
from chatterbox_embed_tpu.utils.device import init_on_cpu, to_default_device

CFG = ConformerConfig()
ROWS, T = 16, 384          # token-rate input; upsampled stage runs at 768


def timed(tag, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) * 1000.0
    print(f"[mb-conf] {tag}: {dt:.2f} ms/fwd", file=sys.stderr)
    return dt


def main():
    t0 = time.time()
    print("[mb-conf] init...", file=sys.stderr)
    params = to_default_device(init_on_cpu(cf.init, jax.random.PRNGKey(0), CFG))
    print(f"[mb-conf] ready {time.time() - t0:.1f}s", file=sys.stderr)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((ROWS, T, CFG.input_size)), jnp.float32)
    lens = jnp.asarray(rng.integers(T // 2, T, (ROWS,)), jnp.int32)
    results = {}

    def fwd(p, x, lens):
        return cf.forward(p, x, lens, cfg=CFG, dtype=jnp.bfloat16)

    os.environ["CHATTERBOX_PALLAS"] = "0"
    results["xla_ms"] = timed("xla", jax.jit(fwd), params, x, lens)
    out_x = jax.jit(fwd)(params, x, lens)

    os.environ["CHATTERBOX_PALLAS"] = "1"
    results["flash_ms"] = timed("flash", jax.jit(lambda *a: fwd(*a)), params, x, lens)
    out_f = jax.jit(lambda *a: fwd(*a))(params, x, lens)

    # parity on VALID rows only (pad-query values legitimately differ)
    valid = (np.arange(2 * T)[None, :] < 2 * np.asarray(lens)[:, None])[..., None]
    d = np.abs(np.asarray(out_f, np.float32) - np.asarray(out_x, np.float32))
    diff = float((d * valid).max())
    ref = float(np.abs(np.asarray(out_x, np.float32) * valid).max())
    results["flash_vs_xla_maxdiff"] = diff
    results["flash_vs_xla_maxref"] = ref
    print(f"[mb-conf] parity: maxdiff {diff:.5f} vs maxref {ref:.3f}", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
