"""Per-row-position KV insert formulations at full-size engine shapes.

The q4t probe measured the continuous engine at 7.77 ms/slot-step vs the
lock-step 4.69 at the same 32-row shape — the only structural deltas are the
per-row cache_pos insert (jnp `.at[layer, pos_vec, rows].set`, i.e. an XLA
scatter with zipped advanced indices) replacing the shared-column
dynamic_update_slice, per-row masks/positions, and vmapped per-row sampling.
This bench isolates the INSERT term: one emulated decode step = 30 layers x
{k, v} writes into the real stacked sequence-major cache layout
(L, Lc, B, H, D), per-row columns, inside a donated lax.scan (slope over two
scan lengths removes RTT + fetch constants — PERF_NOTES timing traps).

Variants:
  dus_shared     shared-column dynamic_update_slice (the lock-step baseline;
                 per-row semantics NOT preserved — cost floor only)
  at_zip         cache.at[l, pos, rows].set(vals) — the engine's current form
  vmap_dus       jax.vmap of a per-row (Lc, H, D) DUS over the batch axis
                 (lowers to a scatter with operand batching dims)
  onehot_mask    cache = where(col==pos_b, val, cache) over a [lo, hi) window?
                 NOT included: reads+writes the full slab per layer by
                 construction (strictly worse than any scatter).

int8 cells add the per-(row, head) scale writes like the real int8-KV path.

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site \
    timeout 1800 python scripts/microbench_rowpos_insert.py
CPU flow check: add --smoke.
"""
from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--rows", type=int, default=32)
    args = ap.parse_args()
    import os
    if args.smoke:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    L_LAYERS, LC, B, H, D = 30, 516, args.rows, 16, 64
    S_SHORT, S_LONG = 32, 128
    if args.smoke:
        L_LAYERS, LC, B, H, D = 2, 24, 4, 2, 8
        S_SHORT, S_LONG = 4, 8

    rng = np.random.default_rng(0)

    def timed(fn, cache, scales, name):
        """Slope timing: run scan lengths S_SHORT and S_LONG, fetch a probe
        scalar (forces execution on remote futures), report per-step ms."""
        walls = []
        for steps in (S_SHORT, S_LONG):
            c = jax.tree.map(jnp.copy, cache)
            s = None if scales is None else jax.tree.map(jnp.copy, scales)
            # warm compile
            out = fn(c, s, steps)
            jax.block_until_ready(np.asarray(out))
            c = jax.tree.map(jnp.copy, cache)
            s = None if scales is None else jax.tree.map(jnp.copy, scales)
            t0 = time.time()
            out = fn(c, s, steps)
            _ = np.asarray(out)          # device fetch, forces execution
            walls.append(time.time() - t0)
        per_step = (walls[1] - walls[0]) / (S_LONG - S_SHORT)
        rec = {"variant": name, "ms_per_step": round(1e3 * per_step, 3),
               "wall_short_s": round(walls[0], 3),
               "wall_long_s": round(walls[1], 3), "rows": B}
        print(json.dumps(rec))
        return rec

    def make_inputs(int8):
        dt = jnp.int8 if int8 else jnp.bfloat16
        ck = jnp.zeros((L_LAYERS, LC, B, H, D), dt)
        cv = jnp.zeros((L_LAYERS, LC, B, H, D), dt)
        scales = None
        if int8:
            scales = (jnp.zeros((L_LAYERS, LC, B, H), jnp.float32),
                      jnp.zeros((L_LAYERS, LC, B, H), jnp.float32))
        lo = min(64, max(1, LC - S_LONG - 3))
        pos0 = jnp.asarray(rng.integers(lo, LC - S_LONG - 2, B), jnp.int32)
        vals = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
        return (ck, cv), scales, pos0, vals

    def run_variant(kind, int8):
        (ck0, cv0), scales0, pos0, vals = make_inputs(int8)

        def insert_layer(ck, cv, cks, cvs, li, pos, k, v):
            rows = jnp.arange(B)
            if int8:
                ksc = jnp.max(jnp.abs(k), axis=-1) / 127.0 + 1e-12   # (B, H)
                vsc = jnp.max(jnp.abs(v), axis=-1) / 127.0 + 1e-12
                kq = jnp.round(k / ksc[..., None]).astype(jnp.int8)
                vq = jnp.round(v / vsc[..., None]).astype(jnp.int8)
            else:
                kq, vq = k.astype(ck.dtype), v.astype(cv.dtype)
                ksc = vsc = None
            if kind == "dus_shared":
                # cost floor: one shared column (row semantics wrong)
                ps = pos[0]
                ck = jax.lax.dynamic_update_slice(
                    ck, kq[None, None], (li, ps, 0, 0, 0))
                cv = jax.lax.dynamic_update_slice(
                    cv, vq[None, None], (li, ps, 0, 0, 0))
                if int8:
                    cks = jax.lax.dynamic_update_slice(
                        cks, ksc[None][None], (li, ps, 0, 0))
                    cvs = jax.lax.dynamic_update_slice(
                        cvs, vsc[None][None], (li, ps, 0, 0))
            elif kind == "at_zip":
                ck = ck.at[li, pos, rows].set(kq)
                cv = cv.at[li, pos, rows].set(vq)
                if int8:
                    cks = cks.at[li, pos, rows].set(ksc)
                    cvs = cvs.at[li, pos, rows].set(vsc)
            elif kind == "vmap_dus":
                def upd(slab, p, val):                  # (Lc, H, D)
                    return jax.lax.dynamic_update_slice(
                        slab, val[None], (p, 0, 0))
                lk = jax.vmap(upd, in_axes=(1, 0, 0), out_axes=1)
                ck = jax.lax.dynamic_update_index_in_dim(
                    ck, lk(ck[li], pos, kq), li, 0)
                cv = jax.lax.dynamic_update_index_in_dim(
                    cv, lk(cv[li], pos, vq), li, 0)
                if int8:
                    def upd_s(slab, p, val):            # (Lc, H)
                        return jax.lax.dynamic_update_slice(
                            slab, val[None], (p, 0))
                    ls = jax.vmap(upd_s, in_axes=(1, 0, 0), out_axes=1)
                    cks = jax.lax.dynamic_update_index_in_dim(
                        cks, ls(cks[li], pos, ksc), li, 0)
                    cvs = jax.lax.dynamic_update_index_in_dim(
                        cvs, ls(cvs[li], pos, vsc), li, 0)
            else:
                raise ValueError(kind)
            return ck, cv, cks, cvs

        @functools.partial(jax.jit, static_argnames=("steps",),
                           donate_argnums=(0, 1))
        def run(cache, scales, steps):
            ck, cv = cache
            cks, cvs = scales if scales is not None else (None, None)

            def body(carry, step):
                ck, cv, cks, cvs, pos = carry
                k = vals * (1.0 + 0.001 * step)      # fresh data per step
                v = vals * (2.0 + 0.001 * step)
                for li in range(L_LAYERS):
                    ck, cv, cks, cvs = insert_layer(ck, cv, cks, cvs, li,
                                                    pos, k, v)
                return (ck, cv, cks, cvs, pos + 1), ()

            (ck, cv, cks, cvs, _), _ = jax.lax.scan(
                body, (ck, cv, cks, cvs, pos0), jnp.arange(steps))
            # read EVERY updated buffer: an unread chain (e.g. cv) would be
            # dead-code-eliminated and the bench would measure half the cost
            probe = (jnp.sum(ck[0, :, 0, 0, 0].astype(jnp.float32))
                     + jnp.sum(cv[0, :, 0, 0, 0].astype(jnp.float32)))
            if cks is not None:
                probe = probe + jnp.sum(cks[0, :, 0, 0]) + jnp.sum(cvs[0, :, 0, 0])
            return probe

        return timed(lambda c, s, n: run(c, s, n), (ck0, cv0), scales0,
                     f"{kind}_{'int8' if int8 else 'bf16'}")

    for int8 in (True, False):
        for kind in ("dus_shared", "at_zip", "vmap_dus"):
            run_variant(kind, int8)


if __name__ == "__main__":
    main()
