"""Deep analysis of a decode-step device trace (VERDICT r3 #1 closure).

Input: the perfetto trace.json.gz written by scripts/profile_decode.py.
The axon-forwarded TPU traces carry full HLO metadata per device event —
`bytes_accessed`, `model_flops`, `source_stack`, shapes — so the decode
loop body can be attributed EXACTLY:

  - loop-body events are isolated by call count (== the traced step count);
  - events aggregate by (source line, hlo_category) with us/step,
    bytes/step and the implied HBM bandwidth;
  - the final table names every component's cost per step against the
    weight-streaming floor (sum of bytes / 819 GB/s on v5e), separating
    "bandwidth-bound at speed-of-light", "bandwidth-bound but slow", and
    "latency/serial-bound" ops — the question rounds 2-3 could only answer
    by elimination.

Usage:
  python scripts/analyze_decode_trace.py --trace-dir /tmp/jax_trace_decode \
      --steps 192 [--min-us 0.5]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

V5E_GBPS = 819.0


def load_events(trace_dir: str):
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        sys.exit(f"no trace under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    device_pids = {pid for pid, n in names.items()
                   if "TPU" in n or "/device" in n.lower() or "Chip" in n}
    return [e for e in events
            if e.get("ph") == "X" and e.get("pid") in device_pids]


def src_key(args_d):
    """Innermost repo frame that is NOT layers.py (the call-site that names
    the component), plus the leaf line for disambiguation."""
    stack = args_d.get("source_stack", "") or args_d.get("source", "")
    frames = [f for f in stack.split("\n") if "/chatterbox_embed_tpu/" in f]
    leaf = frames[0].split("/")[-1] if frames else "?"
    for f in frames:
        if "layers.py" not in f:
            return f.split("/")[-1] + (f" <- {leaf}" if "layers" in leaf else "")
    return leaf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/jax_trace_decode")
    ap.add_argument("--steps", type=int, default=192)
    ap.add_argument("--min-us", type=float, default=0.25,
                    help="hide groups below this us/step")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    events = load_events(args.trace_dir)
    # group repeated loop-body ops: anything called ~steps times (one event
    # per while iteration). Parents (the while itself, the jit) call once.
    per_name = defaultdict(list)
    for e in events:
        per_name[e.get("name", "?")].append(e)
    steps = args.steps
    groups = defaultdict(lambda: dict(us=0.0, bytes=0, flops=0, calls=0,
                                      ops=set(), cat=""))
    loop_us_total = 0.0
    for name, evs in per_name.items():
        n = len(evs)
        if not (0.5 * steps <= n <= 4 * steps):    # loop-body ops only
            continue
        a = evs[0].get("args", {})
        key = (src_key(a), a.get("hlo_category", "?"))
        g = groups[key]
        dur = sum(float(e.get("dur", 0.0)) for e in evs)
        g["us"] += dur
        g["bytes"] += int(a.get("bytes_accessed", 0) or 0) * n
        g["flops"] += int(a.get("model_flops", 0) or 0) * n
        g["calls"] += n
        g["ops"].add(name)
        g["cat"] = a.get("hlo_category", "?")
        loop_us_total += dur

    rows = []
    for (src, cat), g in groups.items():
        us_step = g["us"] / steps
        b_step = g["bytes"] / steps
        bw = (b_step / 1e9) / (us_step / 1e6) if us_step else 0.0
        floor_us = 1e6 * (b_step / 1e9) / V5E_GBPS
        rows.append(dict(src=src, cat=cat, us_step=us_step,
                         mb_step=b_step / 1e6, gbps=bw, floor_us=floor_us,
                         n_ops=len(g["ops"]), calls_step=g["calls"] / steps))
    rows.sort(key=lambda r: -r["us_step"])

    total_us = sum(r["us_step"] for r in rows)
    total_floor = sum(r["floor_us"] for r in rows)
    print(f"decode loop body: {total_us:.0f} us/step device-busy across "
          f"{sum(r['n_ops'] for r in rows)} distinct ops; "
          f"HBM floor of the same ops {total_floor:.0f} us/step "
          f"({sum(r['mb_step'] for r in rows):.0f} MB/step @ {V5E_GBPS:.0f} GB/s)")
    hdr = (f"{'source (component)':46s} {'category':>22s} {'us/st':>7s} "
           f"{'MB/st':>7s} {'GB/s':>6s} {'floor':>6s} {'ops':>4s}")
    print(hdr)
    print("-" * len(hdr))
    out = []
    for r in rows:
        if r["us_step"] < args.min_us:
            continue
        print(f"{r['src'][:46]:46s} {r['cat'][:22]:>22s} {r['us_step']:7.1f} "
              f"{r['mb_step']:7.2f} {r['gbps']:6.0f} {r['floor_us']:6.1f} "
              f"{r['n_ops']:4d}")
        out.append(r)
    if args.json:
        print(json.dumps(dict(total_us_step=total_us,
                              floor_us_step=total_floor, rows=out)))


if __name__ == "__main__":
    main()
