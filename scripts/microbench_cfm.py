"""CFM estimator microbench on the real device: where do the ~8%-MXU passes go?

The estimator (models/flow_decoder.py) is the hot inner graph of batched
synthesis — 20 passes per utterance-batch (10 Euler steps x CFG pair), and at
batch 16 S3Gen is 70% of end-to-end time (PERF_NOTES.md). Ablations attribute
the per-pass cost:

  base        full forward, 10 passes inside one scan (solve_euler shape)
  no_attn     L.mha replaced by identity-on-v (keeps qkv/o matmuls) ->
              isolates the (B,H,T,T) fp32 logits materialisation
  no_tblock   transformer blocks skipped entirely (resnet/conv time)
  fp32        full forward in fp32 (dtype sensitivity)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_cfm.py
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from chatterbox_embed_tpu.config import FlowDecoderConfig
from chatterbox_embed_tpu.models import flow_decoder as fd
from chatterbox_embed_tpu.models import layers as L
from chatterbox_embed_tpu.utils.device import init_on_cpu, to_default_device

CFG = FlowDecoderConfig()
ROWS, T = 16, 512          # batch 8 utterances x CFG pair, ~10 s of mel
PASSES = 10


def timed(tag, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / PASSES * 1000.0
    print(f"[mb-cfm] {tag}: {dt:.2f} ms/pass", file=sys.stderr)
    return dt


def make_prog(dtype):
    @jax.jit
    def prog(params, x, mu, spks, cond):
        def body(h, i):
            t = jnp.full((ROWS,), 0.5, jnp.float32)
            return fd.forward(params, h, mu, t, spks, cond,
                              cfg=CFG, dtype=dtype), ()
        h, _ = jax.lax.scan(body, x, jnp.arange(PASSES))
        return h
    return prog


def main():
    t0 = time.time()
    print("[mb-cfm] init...", file=sys.stderr)
    params = init_on_cpu(fd.init, jax.random.PRNGKey(0), CFG)
    print(f"[mb-cfm] init done {time.time() - t0:.1f}s; transfer...",
          file=sys.stderr)
    params = to_default_device(params)
    print(f"[mb-cfm] transfer done {time.time() - t0:.1f}s", file=sys.stderr)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((ROWS, T, 80)), jnp.float32)
    mu = jnp.asarray(rng.standard_normal((ROWS, T, 80)), jnp.float32)
    spks = jnp.asarray(rng.standard_normal((ROWS, 80)), jnp.float32)
    cond = jnp.zeros((ROWS, T, 80), jnp.float32)
    results = {}

    import os as _os
    _os.environ["CHATTERBOX_PALLAS"] = "0"
    results["base_bf16_ms"] = timed("base bf16 (XLA attn)",
                                    make_prog(jnp.bfloat16),
                                    params, x, mu, spks, cond)

    _os.environ["CHATTERBOX_PALLAS"] = "1"
    results["flash_ms"] = timed("flash attn", make_prog(jnp.bfloat16),
                                params, x, mu, spks, cond)
    # numerics: one pass, flash vs XLA, with a ragged key mask
    mask = (np.arange(T)[None, :] < rng.integers(T // 2, T, (ROWS, 1))
            ).astype(np.float32)[..., None]
    mask = jnp.asarray(mask)
    t_half = jnp.full((ROWS,), 0.5, jnp.float32)

    def one_pass(p, x, mu, t, s, c, m):
        return fd.forward(p, x, mu, t, s, c, mask=m, cfg=CFG,
                          dtype=jnp.bfloat16)

    out_f = jax.jit(one_pass)(params, x, mu, t_half, spks, cond, mask)
    _os.environ["CHATTERBOX_PALLAS"] = "0"
    out_x = jax.jit(lambda *a: one_pass(*a))(params, x, mu, t_half, spks,
                                             cond, mask)
    diff = float(jnp.max(jnp.abs(out_f - out_x)))
    ref = float(jnp.max(jnp.abs(out_x)))
    results["flash_vs_xla_maxdiff"] = diff
    results["flash_vs_xla_maxref"] = ref
    print(f"[mb-cfm] flash parity: maxdiff {diff:.5f} vs maxref {ref:.3f}",
          file=sys.stderr)

    orig_mha = L.mha
    L.mha = lambda q, k, v, mask=None, bias=None, scale=None: v
    results["no_attn_ms"] = timed("no attn", make_prog(jnp.bfloat16),
                                  params, x, mu, spks, cond)
    L.mha = orig_mha

    orig_tblock = fd._tblock
    fd._tblock = lambda p, x, n_heads, dtype, key_mask=None: x
    results["no_tblock_ms"] = timed("no tblock", make_prog(jnp.bfloat16),
                                    params, x, mu, spks, cond)
    fd._tblock = orig_tblock

    results["base_fp32_ms"] = timed("base fp32", make_prog(jnp.float32),
                                    params, x, mu, spks, cond)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
