"""Minimal repro for the session-unstable persistent-compile-cache keys.

Round-4 weak item: the ~83 s warm cold-start was attributed to the remote
(axon) helper producing different persistent-cache keys across sessions —
without a repro. This probe IS the repro: it compiles one uniquely-shaped
jit program with `jax_explain_cache_misses` + persistent-cache logging on,
records compile seconds and the cache-dir entry count, and prints a JSON
verdict. Run it twice (two processes, same argv) — the second run should be
a cache HIT (sub-second compile, entry count unchanged). A MISS on the
second run plus the logged key-component diff is the minimal repro the
round-4 verdict asked for.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/cache_key_probe.py --tag r5
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/cache_key_probe.py --tag r5

Pass a fresh --tag to force a never-before-seen program shape (the tag
seeds the shape so earlier sessions cannot have warmed it).
"""
from __future__ import annotations

import argparse
import glob
import json
import logging
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--count", type=int, default=1,
                    help="number of uniquely-shaped programs: run twice and "
                         "the (first - second) / count slope is the per-"
                         "program MISS-vs-HIT cost; the second run's total / "
                         "count is the per-program warm-start floor (cache "
                         "hit + remote upload RTT) that dominates serving "
                         "cold starts")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    # capture the persistent-cache module's own get/put/miss logging
    logging.basicConfig(stream=sys.stderr, level=logging.DEBUG)
    for noisy in ("jax._src.dispatch", "jax._src.interpreters",
                  "jax._src.xla_bridge"):
        logging.getLogger(noisy).setLevel(logging.WARNING)
    logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
    logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from chatterbox_embed_tpu.utils.device import (_COMPILE_CACHE_DIR,  # noqa: F401
                                                   enable_compilation_cache)
    jax.config.update("jax_explain_cache_misses", True)
    ok = enable_compilation_cache()
    from chatterbox_embed_tpu.utils import device as dev_mod
    cache_dir = dev_mod._COMPILE_CACHE_DIR
    n_before = len(glob.glob(os.path.join(cache_dir or "", "*"))) if cache_dir else -1

    # shapes derived from the tag: unique programs per tag, stable per argv
    # (zlib.crc32, NOT hash() — str hashes are salted per process)
    import zlib
    import numpy as np

    @jax.jit
    def f(a):
        return jnp.tanh(a @ a.T) + jnp.sin(a).sum(axis=0, keepdims=True)

    t0 = time.time()
    for i in range(args.count):
        m = 128 + (zlib.crc32(f"{args.tag}:{i}".encode()) % 997) + 1
        x = jnp.ones((m, m), jnp.float32)
        # remote futures return early — fetch to really time it (CLAUDE.md)
        np.asarray(f(x))
    compile_s = time.time() - t0
    n_after = len(glob.glob(os.path.join(cache_dir or "", "*"))) if cache_dir else -1

    print(json.dumps({
        "tag": args.tag, "cache_enabled": ok, "cache_dir": cache_dir,
        "backend": jax.default_backend(),
        "compile_plus_run_s": round(compile_s, 3),
        "entries_before": n_before, "entries_after": n_after,
        "wrote_new_entry": n_after > n_before,
        "verdict": ("MISS (new entry written — if a prior run used the same "
                    "tag, keys are session-unstable; see stderr explain log)"
                    if n_after > n_before else
                    "HIT (no new entry — keys are stable across processes)"),
    }))


if __name__ == "__main__":
    main()
