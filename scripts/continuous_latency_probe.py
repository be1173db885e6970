"""Request LATENCY under Poisson arrivals: slot-refill engine vs job pooling.

The q4t/q4y/q4z throughput probes showed the ring-column engine matches
lock-step tokens/s on static batch workloads (0.95-1.01x). Throughput was
never the engine's main case — ARRIVAL STREAMS are: with the worker's
WORKER_MAX_BATCH pooling, a request that arrives while a pool is decoding
waits for the whole pool to finish; with the engine it joins the running
decode at the next block boundary.

Simulation (both sides run REAL full-size decodes on the device):
  - N requests, seeded Poisson arrivals at ~80% of measured capacity,
    UNIFORM 250-token lengths — this probe isolates ARRIVAL dynamics;
    length variance was covered by the throughput probes;
  - pooled baseline: an idle worker drains all waiting requests into one
    lock-step generate_batch, padded up to the nearest warm batch bucket
    {4, 8, 16} (mirroring the product's WORKER_WARMUP_BATCHES practice);
  - engine: waiting requests are submitted before every block.
Each side runs twice (programs warm after the first); the second run is
reported. Metrics: mean / p95 latency (completion - arrival), makespan.

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 \
    python scripts/continuous_latency_probe.py [--smoke]
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
    ap.add_argument("--requests", type=int, default=48)
    ap.add_argument("--rate", type=float, default=0.0,
                    help="arrivals/s (0 = 80%% of measured capacity)")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--out", default="measurements/continuous_latency.jsonl")
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
        text_len, req_len = 24, 16
        args.slots, args.block, args.requests = 4, 8, 10
        buckets = (2, 4)
        dtype = jnp.float32
    else:
        cfg = ChatterboxConfig().t3
        text_len, req_len = 96, 250
        buckets = (4, 8, 16)
        dtype = jnp.bfloat16

    rng = np.random.default_rng(0)
    t0 = time.time()
    params = init_on_cpu(t3_mod.init, jax.random.PRNGKey(0), cfg)
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    if on_tpu and os.getenv("CHATTERBOX_INT8", "1") != "0":
        from chatterbox_embed_tpu.utils.quantize import quantize_t3
        params = quantize_t3(params)
    params = to_default_device(jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == np.float32 else x,
        params))
    jax.block_until_ready(params)
    print(f"[lat] init+transfer {time.time() - t0:.1f}s", file=sys.stderr)

    cond = t3_mod.T3Cond(
        speaker_emb=jnp.asarray(rng.standard_normal((1, cfg.speaker_embed_size)),
                                jnp.float32),
        cond_prompt_speech_tokens=jnp.asarray(
            rng.integers(0, 6561, (1, cfg.speech_cond_prompt_len)), jnp.int32),
        emotion_adv=0.5)
    text = np.concatenate([[cfg.start_text_token],
                           rng.integers(1, cfg.text_tokens_dict_size,
                                        text_len - 2),
                           [cfg.stop_text_token]]).astype(np.int32)[None]

    S = args.slots
    N = args.requests
    cap = max(req_len, 16 if args.smoke else 256)

    # measured single-chip capacity (q4y/q4z): ~16 rows at ~6 ms/slot-step
    cap_tps = 400.0 if args.smoke else 1800.0
    rate = args.rate or 0.8 * cap_tps / float(req_len)
    arrivals = np.cumsum(rng.exponential(1.0 / rate, N))
    arrivals[0] = 0.0

    os.makedirs(os.path.dirname(args.out), exist_ok=True)

    def emit(rec):
        line = json.dumps(rec)
        print(line)
        with open(args.out, "a") as f:
            f.write(line + "\n")

    def summarize(side, done_at, extra=None):
        lat = np.asarray([done_at[i] - arrivals[i] for i in range(N)])
        rec = {"cell": side, "mean_latency_s": round(float(lat.mean()), 3),
               "p95_latency_s": round(float(np.percentile(lat, 95)), 3),
               "max_latency_s": round(float(lat.max()), 3),
               "makespan_s": round(max(done_at.values()), 3),
               "requests": N, "req_tokens": req_len, "slots": S,
               "rate_rps": round(rate, 3), "device": str(jax.devices()[0])}
        if extra:
            rec.update(extra)
        emit(rec)
        return rec

    def bucket_of(n):
        for b in buckets:
            if n <= b:
                return b
        return buckets[-1]

    # ---- pooled (worker WORKER_MAX_BATCH semantics) ----------------------
    def run_pooled(tag, seed0):
        t_begin = time.time()
        done_at = {}
        pending = list(range(N))
        pools = 0
        while pending:
            now = time.time() - t_begin
            waiting = [i for i in pending if arrivals[i] <= now]
            if not waiting:
                time.sleep(0.005)
                continue
            pool = waiting[:S]
            for i in pool:
                pending.remove(i)
            bkt = bucket_of(len(pool))
            rows = pool + [pool[-1]] * (bkt - len(pool))   # decoy pad rows
            tb = np.broadcast_to(text, (bkt, text.shape[1])).copy()
            t3_mod.generate_batch(params, cond, tb, max_new_tokens=req_len,
                                  temperature=0.7, cfg_weight=0.5,
                                  stop_on_eos=False,
                                  seed=int(seed0 + rows[0]),
                                  block=req_len, cfg=cfg, dtype=dtype)
            pools += 1
            t_done = time.time() - t_begin
            for i in pool:
                done_at[i] = t_done
        return summarize(tag, done_at, {"pools": pools})

    # ---- engine (submit on arrival, block-wise) --------------------------
    def run_engine(tag, seed0):
        eng = ContinuousDecoder(params, cfg, slots=S, text_bucket=text_len,
                                max_new_tokens=cap, block=args.block,
                                dtype=dtype)
        t_begin = time.time()
        done_at = {}
        submitted = {}
        pending = list(range(N))
        while pending or not eng.idle:
            now = time.time() - t_begin
            for i in [i for i in pending if arrivals[i] <= now]:
                rid = eng.submit(text, cond, seed=seed0 + i, temperature=0.7,
                                 cfg_weight=0.5, max_new_tokens=req_len)
                submitted[rid] = i
                pending.remove(i)
            if eng.idle:
                time.sleep(0.002)
                continue
            finished = eng.step()
            t_done = time.time() - t_begin
            for rid in finished:
                done_at[submitted[rid]] = t_done
        return summarize(tag, done_at, {"blocks": eng.blocks_run})

    # run each side twice: the first run compiles (pool-bucket programs /
    # engine programs), the second is warm and is the reported cell
    run_pooled("cold_pooled_arrivals", 100)
    pooled = run_pooled("pooled_arrivals", 5000)
    run_engine("cold_engine_arrivals", 100)
    engine = run_engine("engine_arrivals", 5000)
    emit({"cell": "summary",
          "mean_latency_ratio": round(pooled["mean_latency_s"]
                                      / engine["mean_latency_s"], 3),
          "p95_latency_ratio": round(pooled["p95_latency_s"]
                                     / engine["p95_latency_s"], 3),
          "makespan_ratio": round(pooled["makespan_s"]
                                  / engine["makespan_s"], 3)})


if __name__ == "__main__":
    main()
