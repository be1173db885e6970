"""Minimal repro for the remote-tunnel compile-cache key instability
(VERDICT r3 weak #6 / PERF_NOTES serving section).

Round-3 audit observed that through the axon tunnel SOME programs
(parameter-unpack parts, token_to_wav) re-miss the persistent XLA
compilation cache inside bench sessions even though the SAME programs
cache-hit deterministically across standalone processes. The attribution —
per-session compile-option forwarding in the remote compile helper — was
made without a repro. This is the repro.

Method: run an identical fixed jit program in N fresh subprocesses, each
with the persistent cache enabled and JAX_LOG_COMPILES on, and record for
each (a) whether a cache file was WRITTEN (miss) or only read (hit) and
(b) the compile log lines. With a stable cache key, exactly ONE process
writes; every later one hits. Any process after the first that writes new
cache entries demonstrates an unstable key, and diffing the two written
entry names localizes it.

Optionally vary a second program shape per process (--vary) to emulate the
bench-session pattern (several programs compiled in one process) and test
whether co-resident compilations perturb the key.

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/repro_cache_key_instability.py [--runs 3] [--vary]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

WORKER = r"""
import os, sys, glob, json
os.environ["JAX_LOG_COMPILES"] = "1"
if os.environ.get("REPRO_SMOKE") == "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax
import jax.numpy as jnp
if os.environ.get("REPRO_SMOKE") == "1":
    jax.config.update("jax_platforms", "cpu")
from chatterbox_embed_tpu.utils.device import enable_compilation_cache
cache_dir = os.environ["REPRO_CACHE_DIR"]
enable_compilation_cache(cache_dir)
before = set(glob.glob(os.path.join(cache_dir, "*")))

@jax.jit
def prog(x, w):
    return jnp.tanh(x @ w) @ w.T

x = jnp.ones((64, 256), jnp.bfloat16)
w = jnp.ones((256, 512), jnp.bfloat16)
prog(x, w).block_until_ready()
mid = set(glob.glob(os.path.join(cache_dir, "*")))   # entries of the FIXED program

if os.environ.get("REPRO_VARY") == "1":
    # a second, process-unique shape compiled in the same session (the
    # bench pattern): must NOT perturb the first program's cache key
    n = 32 + 8 * int(os.environ.get("REPRO_IDX", "0"))
    y = jnp.ones((n, 256), jnp.bfloat16)
    prog(y, w).block_until_ready()

after = set(glob.glob(os.path.join(cache_dir, "*")))
print(json.dumps({"idx": int(os.environ.get("REPRO_IDX", "0")),
                  "fixed_prog_new_entries": sorted(os.path.basename(p)
                                                   for p in mid - before),
                  "varied_new_entries": sorted(os.path.basename(p)
                                               for p in after - mid)}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--vary", action="store_true",
                    help="compile a per-process second shape too")
    ap.add_argument("--cache-dir", default=None)
    ap.add_argument("--smoke", action="store_true", help="CPU backend")
    args = ap.parse_args()

    cache_dir = args.cache_dir or tempfile.mkdtemp(prefix="xla_cache_repro_")
    print(f"[repro] cache dir {cache_dir}", file=sys.stderr)
    results = []
    for i in range(args.runs):
        env = dict(os.environ, REPRO_CACHE_DIR=cache_dir, REPRO_IDX=str(i),
                   REPRO_VARY="1" if args.vary else "0",
                   REPRO_SMOKE="1" if args.smoke else "0",
                   PYTHONPATH="/root/repo:/root/.axon_site")
        p = subprocess.run([sys.executable, "-c", WORKER], env=env,
                           capture_output=True, text=True, timeout=1200)
        if p.returncode != 0:
            print(p.stderr[-1500:], file=sys.stderr)
            raise RuntimeError(f"run {i} failed")
        rec = json.loads(p.stdout.strip().splitlines()[-1])
        compiles = [ln for ln in p.stderr.splitlines()
                    if "Compiling" in ln or "compilation cache" in ln.lower()]
        rec["n_compile_log_lines"] = len(compiles)
        results.append(rec)
        print(f"[repro] run {i}: fixed-program wrote "
              f"{len(rec['fixed_prog_new_entries'])} new cache entries",
              file=sys.stderr)

    # verdict: run 0 legitimately writes the fixed program's entries; a
    # stable key means NO later process writes any new entry for the
    # identical fixed program (the varied shape's entries don't count).
    unstable = [r for r in results[1:] if r["fixed_prog_new_entries"]]
    print(json.dumps({
        "cache_dir": cache_dir,
        "runs": results,
        "stable_key": not unstable,
        "verdict": ("cache key STABLE across processes"
                    if not unstable else
                    f"cache key UNSTABLE: runs {[r['idx'] for r in unstable]} "
                    f"re-wrote entries for an identical program — diff the "
                    f"entry names above to localize the varying key part"),
    }))


if __name__ == "__main__":
    main()
