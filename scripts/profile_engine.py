"""Device-trace attribution of the continuous engine's decode block.

q4t measured the engine block at 7.44 ms/slot-step vs the lock-step 4.69 at
the same 32-row int8-KV shape, with refill exonerated (0.08-0.19 s of 2-6 s
walls) and the per-row scatter insert exonerated by microbench
(scripts/microbench_rowpos_insert.py: 0.4 ms for all 60 inserts). This
captures a real device profile of engine_decode_block and attributes the
residual op-by-op (reuses profile_decode.analyze).

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 python \
      scripts/profile_engine.py [--slots 16] [--steps 128] [--pin-kv]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--block", type=int, default=64)
    ap.add_argument("--pin-kv", action="store_true",
                    help="set CHATTERBOX_PIN_KV=1 before importing")
    ap.add_argument("--trace-dir", default="/tmp/jax_trace_engine")
    args = ap.parse_args()
    if args.pin_kv:
        os.environ["CHATTERBOX_PIN_KV"] = "1"

    import jax
    import jax.numpy as jnp
    from chatterbox_embed_tpu.config import T3Config
    from chatterbox_embed_tpu.models import t3 as t3_mod
    from chatterbox_embed_tpu.models.t3_engine import ContinuousDecoder
    from chatterbox_embed_tpu.utils.device import init_on_cpu, to_default_device
    from profile_decode import analyze  # same scripts/ dir

    cfg = T3Config()
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    t0 = time.time()
    params = init_on_cpu(t3_mod.init, jax.random.PRNGKey(0), cfg)
    if os.getenv("CHATTERBOX_INT8", "1") != "0":
        from chatterbox_embed_tpu.utils.quantize import quantize_t3
        params = quantize_t3(params)
    params = to_default_device(jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == np.float32 else x,
        params))
    jax.block_until_ready(params)
    print(f"[prof] params ready {time.time() - t0:.1f}s", file=sys.stderr)

    cond = t3_mod.T3Cond(
        speaker_emb=jnp.asarray(rng.standard_normal((1, cfg.speaker_embed_size)),
                                jnp.float32),
        cond_prompt_speech_tokens=jnp.asarray(
            rng.integers(0, 6561, (1, cfg.speech_cond_prompt_len)), jnp.int32),
        emotion_adv=0.5)
    text = np.concatenate([[cfg.start_text_token],
                           rng.integers(1, 200, 94),
                           [cfg.stop_text_token]]).astype(np.int32)[None]

    def fill_and_run(seed0, n_blocks):
        eng = ContinuousDecoder(params, cfg, slots=args.slots, text_bucket=96,
                                max_new_tokens=256, block=args.block,
                                dtype=dtype)
        for i in range(args.slots):
            eng.submit(text, cond, seed=seed0 + i, temperature=0.7,
                       cfg_weight=0.5, max_new_tokens=250)
        for _ in range(n_blocks):
            eng.step()
        return eng

    t0 = time.time()
    fill_and_run(0, 2)          # compile + warm
    print(f"[prof] warm {time.time() - t0:.1f}s", file=sys.stderr)

    n_blocks = max(1, args.steps // args.block)
    eng = ContinuousDecoder(params, cfg, slots=args.slots, text_bucket=96,
                            max_new_tokens=256, block=args.block, dtype=dtype)
    for i in range(args.slots):
        eng.submit(text, cond, seed=1000 + i, temperature=0.7,
                   cfg_weight=0.5, max_new_tokens=250)
    eng.step()                  # refill + first block OUTSIDE the trace
    os.makedirs(args.trace_dir, exist_ok=True)
    jax.profiler.start_trace(args.trace_dir)
    t0 = time.time()
    for _ in range(n_blocks):
        eng.step()
    wall = time.time() - t0
    jax.profiler.stop_trace()
    steps = n_blocks * args.block
    print(f"[prof] traced {n_blocks} blocks ({steps} steps) {wall:.3f}s "
          f"({1e3 * wall / steps:.2f} ms/step)", file=sys.stderr)
    analyze(args.trace_dir, steps)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
