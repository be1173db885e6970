"""Decode-step microbench on the real device: where do the 3.5 ms/step go?

Variants (all full-size Llama-520M, B=2 CFG rows, 512-slot cache):
  base        current llama.forward decode (7 matmuls/layer + attention)
  fused       qkv + gate/up concatenated -> 4 matmuls/layer (weights fused
              OUTSIDE the loop and threaded through the carry, so the loop
              body streams the same bytes through fewer, larger matmuls)
  int8        current path with int8 weights (utils.quantize)
  int8_fused  both

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_decode.py
"""
from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from chatterbox_embed_tpu.config import LlamaConfig
from chatterbox_embed_tpu.models import llama
from chatterbox_embed_tpu.models import layers as L
from chatterbox_embed_tpu.utils.device import init_on_cpu, to_default_device

CFG = LlamaConfig()
B, TOTAL, START, STEPS = 2, 512, 0, 128
USE_FLASH = jax.devices()[0].platform not in ("cpu",)


def fuse_params(params):
    layers = []
    for lp in params["layers"]:
        layers.append({
            "ln1": lp["ln1"],
            "qkv": {"w": jnp.concatenate([lp["q"]["w"], lp["k"]["w"], lp["v"]["w"]],
                    axis=1)},
            "o": lp["o"],
            "ln2": lp["ln2"],
            "gateup": {"w": jnp.concatenate([lp["gate"]["w"], lp["up"]["w"]], axis=1)},
            "down": lp["down"],
        })
    return {"layers": layers, "norm": params["norm"]}


def fused_decode(params, x, pos_id, cache, cache_pos, dtype):
    """Mirror of llama.forward's t==1 decode with fused matmuls."""
    b, t, d = x.shape
    h = x.astype(dtype)
    cos, sin = llama.rope_cos_sin(pos_id, CFG)
    q_out = CFG.num_heads * CFG.head_dim
    kv_out = CFG.num_kv_heads * CFG.head_dim
    ck, cv = cache.k, cache.v
    for i, lp in enumerate(params["layers"]):
        hin = L.rms_norm(lp["ln1"], h, CFG.rms_norm_eps)
        qkv = L.linear(lp["qkv"], hin, dtype)
        q = L.split_heads(qkv[..., :q_out], CFG.num_heads)
        k = L.split_heads(qkv[..., q_out:q_out + kv_out], CFG.num_kv_heads)
        v = L.split_heads(qkv[..., q_out + kv_out:], CFG.num_kv_heads)
        q = llama.apply_rope(q, cos, sin)
        k = llama.apply_rope(k, cos, sin)
        k_seq = jnp.swapaxes(k, 0, 1)[None].astype(ck.dtype)
        v_seq = jnp.swapaxes(v, 0, 1)[None].astype(cv.dtype)
        ck = jax.lax.dynamic_update_slice(ck, k_seq, (i, cache_pos, 0, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v_seq, (i, cache_pos, 0, 0, 0))
        if USE_FLASH:
            from chatterbox_embed_tpu.kernels.flash_decode import decode_attention
            att = decode_attention(q[:, 0], ck[i], cv[i], cache_pos, start=START)[:, None]
        else:
            kc, vc = ck[i].astype(dtype), cv[i].astype(dtype)
            logits = jnp.einsum("bhd,lbhd->bhl", q[:, 0], kc,
                                preferred_element_type=jnp.float32)
            logits = logits / np.sqrt(CFG.head_dim)
            km = jnp.arange(TOTAL)[None, :] <= cache_pos
            logits = jnp.where(km[:, None, :], logits, jnp.float32(-1e10))
            w = jax.nn.softmax(logits, axis=-1)
            att = jnp.einsum("bhl,lbhd->bhd", w.astype(dtype), vc)[:, None]
        h = h + L.linear(lp["o"], L.merge_heads(att), dtype)
        hin = L.rms_norm(lp["ln2"], h, CFG.rms_norm_eps)
        gu = L.linear(lp["gateup"], hin, dtype)
        g, u = gu[..., :CFG.intermediate_size], gu[..., CFG.intermediate_size:]
        h = h + L.linear(lp["down"], jax.nn.silu(g) * u, dtype)
    return L.rms_norm(params["norm"], h, CFG.rms_norm_eps), llama.KVCache(ck, cv)


def run_loop(step_fn, params, cache, steps=STEPS):
    x0 = jnp.zeros((B, 1, CFG.hidden_size), jnp.bfloat16)

    @jax.jit
    def prog(params, cache):
        def body(c, i):
            x, cache = c
            h, cache = step_fn(params, x, jnp.full((B, 1), 40 + i, jnp.int32),
                               cache, 40 + i)
            return (h.astype(jnp.bfloat16), cache), ()
        (xf, cache), _ = jax.lax.scan(body, (x0, cache), jnp.arange(steps))
        return xf

    out = prog(params, cache)  # compile
    jax.block_until_ready(out)
    t0 = time.time()
    out = prog(params, cache)
    jax.block_until_ready(out)
    dt = time.time() - t0
    return dt / steps * 1000.0


def main():
    k = jax.random.PRNGKey(0)
    print("[mb] init...", file=sys.stderr)
    params = init_on_cpu(llama.init, k, CFG)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                          if x.dtype == np.float32 else x, params)
    print("[mb] transfer...", file=sys.stderr)
    params = to_default_device(params)
    cache = llama.init_cache(CFG, B, TOTAL, jnp.bfloat16)
    results = {}

    def base_step(p, x, pos, cache, cpos):
        return llama.forward(p, x, pos, None, cache, cpos, CFG, jnp.bfloat16,
                             flash_decode=USE_FLASH, flash_start=START)

    results["base_ms"] = run_loop(base_step, params, cache)
    print("[mb] base", results["base_ms"], file=sys.stderr)

    fused = fuse_params(params)

    def fused_step(p, x, pos, cache, cpos):
        return fused_decode(p, x, pos, cache, cpos, jnp.bfloat16)

    results["fused_ms"] = run_loop(fused_step, fused, cache)
    print("[mb] fused", results["fused_ms"], file=sys.stderr)

    try:
        from chatterbox_embed_tpu.utils.quantize import quantize_t3
        t3like = {"llama": jax.device_get(params)}
        qt = to_default_device(quantize_t3(t3like))
        qparams = qt["llama"]
        results["int8_ms"] = run_loop(base_step, qparams, cache)
        print("[mb] int8", results["int8_ms"], file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        results["int8_error"] = str(e)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
