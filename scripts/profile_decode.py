"""Device-trace attribution of the T3 decode step at B=2 (VERDICT r3 #1).

The single-utterance CFG decode measures 2.29-2.34 ms/step against a 1.3 ms
weight-streaming floor; rounds 2-3 characterized the ~0.9 ms residual only
by elimination (sampling/head/scatter "overhead"). This captures a REAL
device profile of the decode loop and attributes time op-by-op:

  1. jax.profiler.start_trace / stop_trace around a decode_block run
     (one jit, while_loop inside — the trace shows the loop body's fused
     ops with XLA fusion names + HLO op metadata);
  2. parses the perfetto trace.json.gz the profiler writes and aggregates
     device-lane durations by op/fusion name;
  3. prints the top-N ops with total ms, % of device time, and per-step ms
     (durations divided by the decoded step count).

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_decode.py \
      [--steps 128] [--int8] [--trace-dir /tmp/jax_trace_decode]

If the axon tunnel cannot forward device traces, the script says so loudly
(host-only lanes in the trace) instead of printing misattributed numbers.
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np


def capture(args):
    import jax
    import jax.numpy as jnp
    from chatterbox_embed_tpu.config import T3Config
    from chatterbox_embed_tpu.models import t3 as t3_mod
    from chatterbox_embed_tpu.utils.device import init_on_cpu, to_default_device

    cfg = T3Config()
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    t0 = time.time()
    params = init_on_cpu(t3_mod.init, jax.random.PRNGKey(0), cfg)
    if args.int8:
        from chatterbox_embed_tpu.utils.quantize import quantize_t3
        params = quantize_t3(params)
    params = to_default_device(jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == np.float32 else x, params))
    jax.block_until_ready(params)
    print(f"[prof] params ready {time.time() - t0:.1f}s", file=sys.stderr)

    cond = t3_mod.T3Cond(
        speaker_emb=jnp.asarray(rng.standard_normal((1, cfg.speaker_embed_size)),
                                jnp.float32),
        cond_prompt_speech_tokens=jnp.asarray(
            rng.integers(0, 6561, (1, cfg.speech_cond_prompt_len)), jnp.int32),
        emotion_adv=0.5)
    text = np.concatenate([[cfg.start_text_token],
                           rng.integers(1, 200, 30),
                           [cfg.stop_text_token]]).astype(np.int32)[None]

    def run(seed):
        return t3_mod.generate(params, cond, text, max_new_tokens=args.steps,
                               temperature=0.7, cfg_weight=0.5, seed=seed,
                               stop_on_eos=False, cfg=cfg, dtype=dtype)

    t0 = time.time()
    run(0)                                   # compile + warm
    print(f"[prof] warm run {time.time() - t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    run(1)
    wall1 = time.time() - t0
    print(f"[prof] steady run {wall1:.3f}s "
          f"({1000 * wall1 / args.steps:.2f} ms/step incl. dispatch)",
          file=sys.stderr)

    os.makedirs(args.trace_dir, exist_ok=True)
    jax.profiler.start_trace(args.trace_dir)
    t0 = time.time()
    run(2)
    wall = time.time() - t0
    jax.profiler.stop_trace()
    print(f"[prof] traced run {wall:.3f}s "
          f"({1000 * wall / args.steps:.2f} ms/step)", file=sys.stderr)
    return wall


def analyze(trace_dir: str, steps: int, top: int = 40):
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("[prof] ERROR: no trace.json.gz found — the profiler wrote "
              "nothing (remote-tunnel limitation?)", file=sys.stderr)
        sys.exit(2)
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # map pid/tid -> lane name; device lanes contain "TPU" / "/device:"
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    device_pids = {pid for pid, n in names.items()
                   if "TPU" in n or "/device" in n.lower() or "Chip" in n}
    if not device_pids:
        print(f"[prof] ERROR: no device lanes in trace (lanes: "
              f"{sorted(set(names.values()))[:10]}) — device tracing is not "
              f"forwarded here; attribution impossible from this host",
              file=sys.stderr)
        sys.exit(3)
    per_op = defaultdict(float)
    count = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            dur = float(e.get("dur", 0.0))   # us
            nm = e.get("name", "?")
            per_op[nm] += dur
            count[nm] += 1
            total += dur
    rows = sorted(per_op.items(), key=lambda kv: -kv[1])
    print(f"\ndevice time total {total / 1e3:.2f} ms over {steps} steps "
          f"({total / steps:.1f} us/step device-busy)")
    print(f"{'op':60s} {'total ms':>9s} {'%':>6s} {'us/step':>8s} {'calls':>7s}")
    for nm, dur in rows[:top]:
        print(f"{nm[:60]:60s} {dur / 1e3:9.2f} {100 * dur / total:6.2f} "
              f"{dur / steps:8.2f} {count[nm]:7d}")
    return rows, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--trace-dir", default="/tmp/jax_trace_decode")
    ap.add_argument("--analyze-only", action="store_true",
                    help="re-analyze an existing trace dir")
    args = ap.parse_args()
    if not args.analyze_only:
        capture(args)
    analyze(args.trace_dir, args.steps)


if __name__ == "__main__":
    main()
