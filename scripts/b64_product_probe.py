"""B=64-row decode: product-path probe + mitigation ladder (VERDICT r3 #6).

History (PERF_NOTES B=64 study): round 2 saw a hard TPU-worker fault from a
64-row decode step inside a while_loop; round 3's re-run instead got a clean
RESOURCE_EXHAUSTED at the FIRST un-looped step — pointing at cache-slab
memory, not a lowering bug. The un-looped microbench step does NOT donate
its 4 GB KV cache (so it holds two copies plus temporaries); the PRODUCT
decode_block donates its whole carry. This probes the real product path:

  stage 1: t3.MAX_DECODE_UTTERANCES raised to 32, generate_batch over 32
           utterances (64 CFG rows) in ONE fused program, full 250-token
           decode — timed against the shipped sub-batched (16+16) behavior.
  stage 2 (only if stage 1 OOMs): PROBE_INT8_KV=1 — the int8 KV cache
          halves the 4 GB cache slabs AND the per-step cache-read bytes.
  stage 3 (only if stage 2 OOMs): PROBE_TOKENS=125 (halved cache slots).

Each stage prints one JSON line; a worker fault kills the process, which is
itself the recorded outcome (run under `timeout`, check the exit code).

Usage: PYTHONPATH=/root/repo:/root/.axon_site REPRO_B64=1 \
           timeout 2400 python scripts/b64_product_probe.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

if os.getenv("REPRO_B64") != "1":
    print("refusing to run (may kill the TPU worker); set REPRO_B64=1",
          file=sys.stderr)
    sys.exit(0)

import jax
import jax.numpy as jnp

from chatterbox_embed_tpu.config import T3Config
from chatterbox_embed_tpu.models import t3 as t3_mod
from chatterbox_embed_tpu.utils.device import (init_on_cpu, to_default_device,
                                               enable_compilation_cache)

enable_compilation_cache()
cfg = T3Config()
dtype = jnp.bfloat16
rng = np.random.default_rng(0)

t0 = time.time()
if os.getenv("PROBE_INT8_KV") == "1":
    os.environ["CHATTERBOX_INT8_KV"] = "1"
params = init_on_cpu(t3_mod.init, jax.random.PRNGKey(0), cfg)
if os.getenv("PROBE_INT8") == "1":
    from chatterbox_embed_tpu.utils.quantize import quantize_t3
    params = quantize_t3(params)
params = to_default_device(jax.tree.map(
    lambda x: x.astype(jnp.bfloat16) if x.dtype == np.float32 else x, params))
jax.block_until_ready(params)
print(f"[b64] params ready {time.time() - t0:.1f}s", file=sys.stderr)

cond = t3_mod.T3Cond(
    speaker_emb=jnp.asarray(rng.standard_normal((1, cfg.speaker_embed_size)),
                            jnp.float32),
    cond_prompt_speech_tokens=jnp.asarray(
        rng.integers(0, 6561, (1, cfg.speech_cond_prompt_len)), jnp.int32),
    emotion_adv=0.5)
text = np.concatenate([[cfg.start_text_token], rng.integers(1, 200, 30),
                       [cfg.stop_text_token]]).astype(np.int32)[None]
U = int(os.getenv("PROBE_UTT", "32"))
texts = np.broadcast_to(text, (U, text.shape[1])).copy()


def run(tokens: int, label: str):
    t_a = time.time()
    outs = t3_mod.generate_batch(params, cond, texts, max_new_tokens=tokens,
                                 temperature=0.7, cfg_weight=0.5,
                                 stop_on_eos=False, seed=1, block=tokens,
                                 cfg=cfg, dtype=dtype)
    compile_s = time.time() - t_a
    t_a = time.time()
    outs = t3_mod.generate_batch(params, cond, texts, max_new_tokens=tokens,
                                 temperature=0.7, cfg_weight=0.5,
                                 stop_on_eos=False, seed=2, block=tokens,
                                 cfg=cfg, dtype=dtype)
    wall = time.time() - t_a
    info = dict(t3_mod.LAST_GENERATION_INFO)
    print(json.dumps({
        "stage": label, "utterances": U, "rows": 2 * U, "tokens": tokens,
        "ok": len(outs) == U and all(o.size > 0 for o in outs),
        "wall_s": round(wall, 3), "ms_per_step": round(1000 * wall / tokens, 3),
        "ms_per_utt_step": round(1000 * wall / tokens / U, 4),
        "compile_s": round(compile_s, 1),
        "cache_total": info.get("cache_total"), "n_utt": info.get("n_utt"),
        "int8": os.getenv("PROBE_INT8") == "1",
        "kv_int8": info.get("kv_int8"),
    }), flush=True)
    return wall


# baseline: the shipped sub-batched behavior (fence at 16)
print("[b64] baseline: sub-batched 16+16", file=sys.stderr)
base = run(int(os.getenv("PROBE_TOKENS", "250")), "baseline_subbatched_16")

# stage 1: raise the fence — ONE fused 64-row program on the product path
print("[b64] stage 1: fence raised to 32 (64 rows, donated while_loop)",
      file=sys.stderr)
t3_mod.MAX_DECODE_UTTERANCES = 64
one = run(int(os.getenv("PROBE_TOKENS", "250")), "fused_32utt_64rows")
print(f"[b64] fused/sub-batched wall ratio: {one / base:.3f}", file=sys.stderr)
