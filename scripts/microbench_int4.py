"""int4 weight-streaming microbench for the T3 decode matmul chain.

PERF_NOTES agenda #4's closing note: the decode residual is now gaps, and
the only remaining lever that shrinks the BUSY side is fewer weight bytes.
int8 took the matmul chain ~950 -> ~550 us/step (convert fuses into the
dot, HBM reads halve). This measures whether int4 buys the next halving
on v5e — i.e. whether XLA keeps the weights int4 in HBM and fuses the
int4->bf16 convert into the dot, or materialises a dequantized copy
(which would make it a LOSS like KV mode 2).

Shape = the product decode chain: 30 layers x (q,k,v,o: 1024x1024;
gate,up: 1024x4096; down: 4096x1024) at B=2 rows, run as a scan with a
donated carry (tunnel memoization rule). Weight bytes/step: bf16 1.06 GB,
int8 530 MB, int4 265 MB -> streaming-bound floors ~1.29 / 0.65 / 0.32 ms.

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_int4.py
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

D, INTER, LAYERS, B = 1024, 4096, 30, 2


def make_params(rng: np.random.Generator, mode: str):
    """mode: bf16 | int8 | int4. Quantization is symmetric per-out-channel
    (the shipped scheme, layers.quantize_linear); int4 uses the same scheme
    clipped to [-7, 7]."""
    layers = []
    for _ in range(LAYERS):
        lp = {}
        for name, (di, do) in dict(q=(D, D), k=(D, D), v=(D, D), o=(D, D),
                                   gate=(D, INTER), up=(D, INTER),
                                   down=(INTER, D)).items():
            w = (rng.standard_normal((di, do)) * 0.02).astype(np.float32)
            if mode == "bf16":
                lp[name] = {"w": jnp.asarray(w, jnp.bfloat16)}
            else:
                qmax = 127.0 if mode == "int8" else 7.0
                dt = jnp.int8 if mode == "int8" else jnp.int4
                scale = np.abs(w).max(0) / qmax + 1e-12
                wq = np.clip(np.round(w / scale), -qmax, qmax)
                lp[name] = {"w_q": jnp.asarray(wq.astype(np.int8), dt),
                            "scale": jnp.asarray(scale, np.float32)}
        layers.append(lp)
    return layers


def linear(p, x):
    if "w" in p:
        return x @ p["w"]
    w = p["w_q"].astype(jnp.bfloat16) * p["scale"].astype(jnp.bfloat16)
    return x @ w


@functools.partial(jax.jit, static_argnames=("steps",), donate_argnums=(1,))
def chain(params, x, steps: int):
    def body(h, _):
        for lp in params:
            a = linear(lp["q"], h) + linear(lp["k"], h) + linear(lp["v"], h)
            h = h + linear(lp["o"], a)
            m = jax.nn.silu(linear(lp["gate"], h)) * linear(lp["up"], h)
            h = h + linear(lp["down"], m)
            h = h / (1e-6 + jnp.sqrt(jnp.mean(h * h, -1, keepdims=True)))
        return h, ()
    h, _ = jax.lax.scan(body, x, None, length=steps)
    return h


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--modes", default="bf16,int8,int4")
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    out = {}
    for mode in args.modes.split(","):
        try:
            params = jax.device_put(make_params(rng, mode))
            jax.block_until_ready(params)
            x = jnp.asarray(rng.standard_normal((B, D)), jnp.bfloat16)
            t0 = time.time()
            x = chain(params, x, args.steps)          # compile + warm
            jax.block_until_ready(x)
            print(f"[int4] {mode} compile+warm {time.time() - t0:.1f}s",
                  flush=True)
            times = []
            for _ in range(args.iters):
                t0 = time.time()
                x = chain(params, x, args.steps)      # donated carry
                jax.block_until_ready(x)
                times.append((time.time() - t0) / args.steps * 1e3)
            out[mode] = round(float(np.median(times)), 4)
            print(f"[int4] {mode}: {out[mode]:.3f} ms/step "
                  f"(all {['%.3f' % t for t in times]})", flush=True)
        except Exception as e:  # noqa: BLE001 — int4 support may be absent
            out[mode] = f"ERROR: {e}"
            print(f"[int4] {mode} FAILED: {e}", flush=True)
    import json
    print(json.dumps(out))


if __name__ == "__main__":
    main()
