"""CFM solver-cache quality gate: mel distance of DeepCache-style reuse.

CHATTERBOX_CFM_CACHE=K (models/cfm.py solve_euler) recomputes the estimator's
mid stack only on every K-th Euler step — measured -24% batched S3Gen at
batch 32 (PERF_NOTES round-4 table) — but it changes numerics, so promotion
needs the same quantitative treatment int8 got (scripts/int8_quality_gate.py):
synthesize the SAME tokens through the plain (K=0) and cached flow stacks at
FULL SIZE and bound the mel distance.

Gate (per K, ALL rows must hold — identical bounds to the int8 mel gate):
  - mel cosine >= 0.995 (min over rows),
  - relative L2 error < 0.10 (max over rows).

The env var binds at TRACE time, so each K gets a FRESH jax.jit instance of
_flow_to_mel_impl (the product jit in s3gen.py would silently reuse the K it
was first traced with). Random weights exercise the identical arithmetic;
the one-line caveat from the int8 promotion applies unchanged — a final
listen on converted checkpoints is the last sign-off
(scripts/verify_on_network_host.py runbook).

Round-4 extension: --cfg-steps gates CFG-INTERVAL truncation
(cfm.solve_euler cfg_steps=k — the cond/uncond pair only on the first k of
10 Euler steps, cond-only rows after; halves the estimator work of the
truncated steps). Each cell runs at --cell-k (default 2, the promoted
batched stride) so the gate bounds the COMPOSED product config against the
exact CFG-every-step solver. Same bounds as the stride gate.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/cfm_cache_gate.py \
      [--rows 4] [--tokens 250] [--ks 2,3] [--cfg-steps 5,6,8] [--cell-k 2] \
      [--smoke]
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
    ap.add_argument("--rows", type=int, default=4, help="utterance rows")
    ap.add_argument("--tokens", type=int, default=250, help="speech tokens/row")
    ap.add_argument("--ks", default="2,3", help="cache strides to gate")
    ap.add_argument("--cfg-steps", default="",
                    help="CFG-interval cells to gate (comma list of k)")
    ap.add_argument("--cell-k", type=int, default=2,
                    help="cache stride the --cfg-steps cells compose with")
    ap.add_argument("--smoke", action="store_true", help="tiny config on CPU")
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint dir with s3gen.safetensors — gate the "
                         "DEPLOYED weights instead of random ones "
                         "(scripts/verify_on_network_host.py stage D)")
    args = ap.parse_args()
    if args.smoke:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from chatterbox_embed_tpu.config import (S3GenConfig, S3TokenizerConfig,
                                             ConformerConfig, FlowDecoderConfig,
                                             HiFTConfig, replace)
    from chatterbox_embed_tpu.models import s3gen as s3gen_mod
    from chatterbox_embed_tpu.utils.device import init_on_cpu, to_default_device

    if args.smoke:
        s3cfg = S3GenConfig(
            flow=replace(S3GenConfig().flow,
                         encoder=ConformerConfig(input_size=32, output_size=32,
                                                 attention_heads=4, linear_units=64,
                                                 num_blocks=1, num_up_blocks=1),
                         decoder=FlowDecoderConfig(in_channels=32, out_channels=8,
                                                   channels=16, attention_head_dim=8,
                                                   num_heads=2, n_blocks=1,
                                                   num_mid_blocks=1, time_embed_dim=64),
                         input_size=32, output_size=8),
            hift=HiFTConfig(in_channels=8, base_channels=32, f0_cond_channels=16),
            tokenizer=S3TokenizerConfig(n_state=64, n_heads=4, n_layers=1),
            mel_num=8)
        dtype = jnp.float32
        args.tokens = min(args.tokens, 24)
        n_prompt = 8
    else:
        s3cfg = S3GenConfig()
        dtype = jnp.bfloat16
        n_prompt = 150

    rng = np.random.default_rng(0)
    t0 = time.time()
    if args.ckpt:
        from chatterbox_embed_tpu.utils import weights as W
        s3_sd = W.load_safetensors(f"{args.ckpt}/s3gen.safetensors")
        s3_params = W.convert_s3gen(s3_sd, cfg=s3cfg)
    else:
        s3_params = init_on_cpu(s3gen_mod.init, jax.random.PRNGKey(1), s3cfg)
    if dtype == jnp.bfloat16:
        s3_params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == np.float32 else x,
            s3_params)
    s3_params = to_default_device(s3_params)
    jax.block_until_ready(s3_params)
    print(f"[cfm-gate] params ready {time.time() - t0:.1f}s", file=sys.stderr)

    b = args.rows
    toks = jnp.asarray(rng.integers(0, 6561, (b, args.tokens)), jnp.int32)
    tl = jnp.asarray(np.full((b,), n_prompt + args.tokens), jnp.int32)
    pt = jnp.asarray(rng.integers(0, 6561, (b, n_prompt)), jnp.int32)
    pf = jnp.asarray(rng.standard_normal((b, 2 * n_prompt, s3cfg.mel_num)),
                     jnp.float32)
    emb = jnp.asarray(rng.standard_normal((b, s3cfg.flow.spk_embed_dim)),
                      jnp.float32)

    def run_with_k(k: int, cfg_steps=None) -> np.ndarray:
        # fresh FUNCTION IDENTITY per K: CHATTERBOX_CFM_CACHE binds at trace
        # time, and jax's jaxpr cache is keyed on (fn, avals, statics) GLOBALLY
        # — a second jax.jit(s3gen_mod._flow_to_mel_impl) with the same shapes
        # reuses the first K's trace and never re-reads the env (caught in the
        # CPU smoke: K=2 "compiled" in 0.0s, bit-identical to K=0)
        os.environ["CHATTERBOX_CFM_CACHE"] = str(k)

        def _fresh(params, tokens, token_len, prompt_tokens, prompt_feat,
                   embedding, finalize, cfg, dtype, cfg_steps):
            return s3gen_mod._flow_to_mel_impl(
                params, tokens, token_len, prompt_tokens, prompt_feat,
                embedding, finalize, cfg, dtype, cfg_steps=cfg_steps)

        f = jax.jit(_fresh, static_argnames=("finalize", "cfg", "dtype",
                                             "cfg_steps"))
        t1 = time.time()
        out = np.asarray(f(s3_params, toks, tl, pt, pf, emb, True,
                           s3cfg, dtype, cfg_steps), np.float64)
        print(f"[cfm-gate] K={k} cfg_steps={cfg_steps}: mel {out.shape} in "
              f"{time.time() - t1:.1f}s (compile-dominated)", file=sys.stderr)
        return out

    prev = os.environ.get("CHATTERBOX_CFM_CACHE")
    try:
        ref = run_with_k(0)
        per_k = {}
        for k in [int(x) for x in args.ks.split(",") if x]:
            mel = run_with_k(k)
            cos = [float(np.sum(ref[i] * mel[i])
                         / (np.linalg.norm(ref[i]) * np.linalg.norm(mel[i])
                            + 1e-12)) for i in range(b)]
            rel = [float(np.linalg.norm(ref[i] - mel[i])
                         / (np.linalg.norm(ref[i]) + 1e-12)) for i in range(b)]
            per_k[str(k)] = {
                "mel_cosine_min": min(cos),
                "mel_rel_l2_max": max(rel),
                "pass": min(cos) >= 0.995 and max(rel) < 0.10,
            }
            print(f"[cfm-gate] K={k}: cos(min) {min(cos):.5f} "
                  f"rel(max) {max(rel):.4f}", file=sys.stderr)
        per_cfg = {}
        for kc in [int(x) for x in args.cfg_steps.split(",") if x]:
            mel = run_with_k(args.cell_k, cfg_steps=kc)
            cos = [float(np.sum(ref[i] * mel[i])
                         / (np.linalg.norm(ref[i]) * np.linalg.norm(mel[i])
                            + 1e-12)) for i in range(b)]
            rel = [float(np.linalg.norm(ref[i] - mel[i])
                         / (np.linalg.norm(ref[i]) + 1e-12)) for i in range(b)]
            per_cfg[str(kc)] = {
                "cell_k": args.cell_k,
                "mel_cosine_min": min(cos),
                "mel_rel_l2_max": max(rel),
                "pass": min(cos) >= 0.995 and max(rel) < 0.10,
            }
            print(f"[cfm-gate] K={args.cell_k} cfg_steps={kc}: "
                  f"cos(min) {min(cos):.5f} rel(max) {max(rel):.4f}",
                  file=sys.stderr)
    finally:
        if prev is None:
            os.environ.pop("CHATTERBOX_CFM_CACHE", None)
        else:
            os.environ["CHATTERBOX_CFM_CACHE"] = prev

    result = {
        "rows": b,
        "tokens": args.tokens,
        "weights": "checkpoint" if args.ckpt else "random",
        "per_k": per_k,
        "pass_ks": [k for k, v in per_k.items() if v["pass"]],
        "per_cfg_steps": per_cfg,
        "pass_cfg_steps": [k for k, v in per_cfg.items() if v["pass"]],
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
