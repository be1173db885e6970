"""Continuous-batching T3 engine: full-size TPU probe vs lock-step decode.

Cells (all full-size T3, bf16 + the round-4 int8 defaults, one v5e chip):

  locked_uniform  : lock-step generate_batch, 16 utts x 250 tokens — the
                    shipped pooled path at its happy shape (no length skew).
  engine_uniform  : the same workload through the slot-refill engine
                    (16 slots, per-request limit 250). Isolates the engine's
                    per-step overhead (per-row scatter insert, per-row masks,
                    vmapped sampling) from any utilization win.
  locked_skewed   : 32 requests with skewed lengths (uniform 120..380) in two
                    arrival-order pools of 16; every pool decodes to its max
                    length (rows idle once done) — the lock-step utilization
                    model.
  engine_skewed   : same 32 requests through 16 slots with refill — freed
                    slots take queued requests mid-flight; the utilization
                    win continuous batching exists for.

Metric per cell: generated-tokens/s of wall (and ms per slot-step). The
engine's win condition: engine_skewed tokens/s > locked_skewed, with
engine_uniform within ~10% of locked_uniform (overhead bound).

Timing through the tunnel: every block's tokens are device_get-fetched by the
host loop (no memoization / future-return traps — the carries are donated and
distinct every step). A warmup pass compiles all programs first; timed cells
reuse them.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 \
      python scripts/continuous_probe.py [--slots 16] [--out measurements/...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--block", type=int, default=64)
    ap.add_argument("--text-len", type=int, default=96)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny config on CPU (flow check only)")
    ap.add_argument("--ablate", action="store_true",
                    help="also run the pos/rng ablation cells (attribution)")
    ap.add_argument("--out", default="measurements/continuous_probe.jsonl")
    args = ap.parse_args()

    if args.smoke:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from chatterbox_embed_tpu.config import (ChatterboxConfig, LlamaConfig,
                                             T3Config)
    from chatterbox_embed_tpu.models import t3 as t3_mod
    from chatterbox_embed_tpu.models.t3_engine import ContinuousDecoder
    from chatterbox_embed_tpu.utils.device import (enable_compilation_cache,
                                                   init_on_cpu,
                                                   to_default_device)

    enable_compilation_cache()
    if args.smoke:
        cfg = T3Config(
            llama=LlamaConfig(hidden_size=64, intermediate_size=128,
                              num_layers=2, num_heads=4, num_kv_heads=4,
                              head_dim=16),
            max_text_tokens=64, max_speech_tokens=128,
            speech_cond_prompt_len=8)
        args.text_len = min(args.text_len, 32)
        args.slots = min(args.slots, 4)
        args.block = min(args.block, 8)
        dtype = jnp.float32
    else:
        cfg = ChatterboxConfig().t3
        dtype = jnp.bfloat16
    on_tpu = jax.devices()[0].platform not in ("cpu",)

    rng = np.random.default_rng(0)
    t0 = time.time()
    params = init_on_cpu(t3_mod.init, jax.random.PRNGKey(0), cfg)
    if on_tpu and os.getenv("CHATTERBOX_INT8", "1") != "0":
        from chatterbox_embed_tpu.utils.quantize import quantize_t3
        params = quantize_t3(params)
    params = to_default_device(jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params))
    jax.block_until_ready(params)
    print(f"[probe] init+transfer {time.time() - t0:.1f}s", file=sys.stderr)

    cond = t3_mod.T3Cond(
        speaker_emb=jnp.asarray(rng.standard_normal((1, cfg.speaker_embed_size)),
                                jnp.float32),
        cond_prompt_speech_tokens=jnp.asarray(
            rng.integers(0, 6561, (1, cfg.speech_cond_prompt_len)), jnp.int32),
        emotion_adv=0.5)
    text = np.concatenate([[cfg.start_text_token],
                           rng.integers(1, cfg.text_tokens_dict_size,
                                        args.text_len - 2),
                           [cfg.stop_text_token]]).astype(np.int32)[None]

    S = args.slots
    results = []
    out_path = args.out
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    def emit(cell, wall, tokens, n_utt, extra=None):
        rec = {"cell": cell, "wall_s": round(wall, 3), "tokens": int(tokens),
               "tokens_per_s": round(tokens / wall, 1), "utt": n_utt,
               "slots": S, "block": args.block,
               "device": str(jax.devices()[0])}
        if extra:
            rec.update(extra)
        results.append(rec)
        line = json.dumps(rec)
        print(line)
        with open(out_path, "a") as f:
            f.write(line + "\n")

    def make_engine(cap, ablate="", block=None):
        return ContinuousDecoder(params, cfg, slots=S,
                                 text_bucket=args.text_len,
                                 max_new_tokens=cap, block=block or args.block,
                                 dtype=dtype, _ablate=ablate)

    def run_engine(lens, tag, seed0, ablate="", block=None):
        # match the lock-step cache capacity (p_len + max(max_new, 256)) so
        # the full-capacity KV read per step is identical in both paths
        eng = make_engine(max(int(max(lens)), 256), ablate, block)
        t_a = time.time()
        rids = [eng.submit(text, cond, seed=seed0 + i, temperature=0.7,
                           cfg_weight=0.5, max_new_tokens=int(n))
                for i, n in enumerate(lens)]
        res = eng.drain()
        wall = time.time() - t_a
        toks = sum(res[r].shape[0] for r in rids)
        emit(tag, wall, toks, len(lens),
             {"blocks": eng.blocks_run,
              "refill_s": round(eng.t_refill, 3),
              "decode_s": round(eng.t_decode, 3),
              "decode_ms_per_step": round(
                  1e3 * eng.t_decode / max(eng.steps_run, 1), 3),
              "slot_step_ms": round(1e3 * wall / max(eng.blocks_run, 1)
                                    / args.block, 3)})

    def run_locked(lens, tag, seed0):
        t_a = time.time()
        toks = 0
        for s0 in range(0, len(lens), S):
            pool = lens[s0:s0 + S]
            u = len(pool)
            tb = np.broadcast_to(text, (u, text.shape[1])).copy()
            mx = int(max(pool))
            outs = t3_mod.generate_batch(
                params, cond, tb, max_new_tokens=mx, temperature=0.7,
                cfg_weight=0.5, stop_on_eos=False, seed=seed0 + s0,
                block=mx, cfg=cfg, dtype=dtype)
            # rows idle (masked) past their own length in the pooled model:
            # count only each request's OWN tokens as useful output
            toks += int(sum(min(len(o), n) for o, n in zip(outs, pool)))
        emit(tag, time.time() - t_a, toks, len(lens))

    # Each cell runs TWICE with different seeds: the first run carries the
    # XLA compiles (lock-step pools each bind their own cache-cap program);
    # the second is the timed warm run. Different seeds defeat the remote
    # backend's identical-(program, inputs) execution memoization
    # (CLAUDE.md microbenching note).
    def cell(fn, lens, tag):
        fn(lens, "cold_" + tag, 100)
        fn(lens, tag, 5000)

    # -- cells ------------------------------------------------------------
    uniform = [16 if args.smoke else 250] * S
    cell(run_locked, uniform, "locked_uniform")
    cell(run_engine, uniform, "engine_uniform")

    if args.ablate:
        # price the per-row sampling chain (the ring-column redesign already
        # removed the per-row insert/mask cost the old "pos" cell measured)
        for ab in ("rng",):
            run_engine(uniform, f"cold_engine_uniform_{ab}", 100, ab)
            run_engine(uniform, f"engine_uniform_{ab}", 5000, ab)

    skew = (rng.integers(8, 24, 2 * S) if args.smoke
            else rng.integers(120, 380, 2 * S)).tolist()
    cell(run_locked, skew, "locked_skewed")
    cell(run_engine, skew, "engine_skewed")

    # deep queue (4x slots): refill's tail/quantization waste amortizes with
    # queue depth — the regime continuous batching exists for. The finer
    # block halves the refill-boundary idle at 2x the host round-trips.
    deep = (rng.integers(8, 24, 4 * S) if args.smoke
            else rng.integers(120, 380, 4 * S)).tolist()
    cell(run_locked, deep, "locked_deep")
    cell(run_engine, deep, "engine_deep")
    run_engine(deep, "cold_engine_deep_b32", 100, "", 32)
    run_engine(deep, "engine_deep_b32", 5000, "", 32)

    by = {r["cell"]: r for r in results}
    summary = {
        "cell": "summary",
        "engine_overhead_uniform":
            round(by["locked_uniform"]["tokens_per_s"]
                  / by["engine_uniform"]["tokens_per_s"], 3),
        "engine_speedup_skewed":
            round(by["engine_skewed"]["tokens_per_s"]
                  / by["locked_skewed"]["tokens_per_s"], 3),
    }
    if "locked_deep" in by:
        summary["engine_speedup_deep"] = round(
            by["engine_deep"]["tokens_per_s"]
            / by["locked_deep"]["tokens_per_s"], 3)
        summary["engine_speedup_deep_b32"] = round(
            by["engine_deep_b32"]["tokens_per_s"]
            / by["locked_deep"]["tokens_per_s"], 3)
    print(json.dumps(summary))
    with open(out_path, "a") as f:
        f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
