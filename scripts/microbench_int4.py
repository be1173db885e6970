"""int4 weight-streaming microbench for the T3 decode matmul chain.

PERF_NOTES agenda #4's closing note: the decode residual is now gaps, and
the only remaining lever that shrinks the BUSY side is fewer weight bytes.
int8 took the matmul chain ~950 -> ~550 us/step (convert fuses into the
dot, HBM reads halve). This measures whether int4 buys the next halving
on v5e — i.e. whether XLA keeps the weights int4 in HBM and fuses the
int4->bf16 convert into the dot, or materialises a dequantized copy
(which would make it a LOSS like KV mode 2).

Shape = the product decode chain: 30 layers x (q,k,v,o: 1024x1024;
gate,up: 1024x4096; down: 4096x1024) at B=2 rows. Weight bytes/step:
bf16 1.06 GB, int8 530 MB, int4 265 MB -> streaming-bound floors
~1.29 / 0.65 / 0.32 ms/step.

Timing traps (PERF_NOTES): on the remote backend only a device-to-host
FETCH (np.asarray) forces execution — block_until_ready returns
immediately on remote futures, and identical executions memoize — so
every timed call uses fresh host inputs AND fetches its result; the
slope over two scan lengths removes the RTT+fetch constant. int4 buffers are
created ON DEVICE (w8.astype(int4) inside a jit): the tunnel transfer
path rejects sub-byte host buffers ("Recursively calling jit", first
attempt 2026-08-18).

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_int4.py
"""
from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

D, INTER, LAYERS, B = 1024, 4096, 30, 2
SHAPES = dict(q=(D, D), k=(D, D), v=(D, D), o=(D, D),
              gate=(D, INTER), up=(D, INTER), down=(INTER, D))


def make_params(rng: np.random.Generator, mode: str):
    """mode: bf16 | int8 | int4 | int4pack. Symmetric per-out-channel
    scales (the shipped layers.quantize_linear scheme); int4 clips to
    [-7, 7] and is materialised on device from the int8 buffers (native
    S4 — the axon tunnel cannot TRANSFER sub-byte hosts buffers, and may
    not hold them either); int4pack stores two 4-bit weights per uint8
    byte (input-dim rows 2j / 2j+1 in the lo / hi nibble) so only u8
    crosses the boundary — the split-dot linear below unpacks them."""
    layers = []
    for _ in range(LAYERS):
        lp = {}
        for name, (di, do) in SHAPES.items():
            w = (rng.standard_normal((di, do)) * 0.02).astype(np.float32)
            if mode == "bf16":
                lp[name] = {"w": jnp.asarray(w, jnp.bfloat16)}
            elif mode == "int8":
                scale = np.abs(w).max(0) / 127.0 + 1e-12
                wq = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
                lp[name] = {"w_q": jnp.asarray(wq),
                            "scale": jnp.asarray(scale, np.float32)}
            else:
                scale = np.abs(w).max(0) / 7.0 + 1e-12
                wq = np.clip(np.round(w / scale), -7, 7).astype(np.int8)
                if mode == "int4pack":
                    u = (wq + 8).astype(np.uint8)         # [1, 15]
                    packed = (u[0::2] | (u[1::2] << 4))   # (di/2, do)
                    lp[name] = {"w_p": jnp.asarray(packed),
                                "scale": jnp.asarray(scale, np.float32)}
                else:
                    lp[name] = {"w_q": jnp.asarray(wq),
                                "scale": jnp.asarray(scale, np.float32)}
        layers.append(lp)
    layers = jax.device_put(layers)
    if mode == "int4":
        to4 = jax.jit(lambda p: jax.tree.map(
            lambda x: x.astype(jnp.int4) if x.dtype == jnp.int8 else x, p))
        layers = to4(layers)
    return layers


def linear(p, x):
    if "w" in p:
        return x @ p["w"]
    if "w_p" in p:
        # split dot over the nibble-packed buffer: rows 2j ride the lo
        # nibble, rows 2j+1 the hi nibble; the unpack is elementwise on
        # the SAME (di/2, do) packed tile (no reshape/interleave), so XLA
        # has the chance to fuse it into each dot's operand load
        lo = (p["w_p"] & jnp.uint8(0xF)).astype(jnp.bfloat16) - 8.0
        hi = (p["w_p"] >> jnp.uint8(4)).astype(jnp.bfloat16) - 8.0
        s = p["scale"].astype(jnp.bfloat16)
        return (x[:, 0::2] @ lo + x[:, 1::2] @ hi) * s
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
    ap.add_argument("--steps", default="32,128",
                    help="short,long scan lengths for slope timing")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--modes", default="bf16,int8,int4,int4pack")
    args = ap.parse_args()
    s_short, s_long = (int(s) for s in args.steps.split(","))
    rng = np.random.default_rng(0)
    out = {}
    for mode in args.modes.split(","):
        try:
            params = make_params(rng, mode)
            jax.block_until_ready(params)
            walls = {}
            for steps in (s_short, s_long):
                x = jnp.asarray(rng.standard_normal((B, D)), jnp.bfloat16)
                t0 = time.time()
                np.asarray(chain(params, x, steps))   # FETCH forces execution
                print(f"[int4] {mode} steps={steps} compile+warm "
                      f"{time.time() - t0:.1f}s", flush=True)
                ts = []
                for _ in range(args.iters):
                    x = jnp.asarray(rng.standard_normal((B, D)), jnp.bfloat16)
                    t0 = time.time()
                    np.asarray(chain(params, x, steps))
                    ts.append(time.time() - t0)
                walls[steps] = float(np.median(ts))
            slope = 1e3 * (walls[s_long] - walls[s_short]) / (s_long - s_short)
            out[mode] = {"ms_per_step_slope": round(slope, 4),
                         "wall_s": {str(k): round(v, 4) for k, v in walls.items()}}
            print(f"[int4] {mode}: {slope:.3f} ms/step (slope)", flush=True)
        except Exception as e:  # noqa: BLE001 — int4 support may be absent
            out[mode] = f"ERROR: {type(e).__name__}: {str(e)[:300]}"
            print(f"[int4] {mode} FAILED: {out[mode]}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
