"""Stage-level attribution of the batched S3Gen pass (tokens -> wav).

Batched S3Gen is co-dominant with T3 at batch 32 (r4e: s3gen 4.18 s vs t3
2.0 s) but nothing attributes WHERE it goes: the upsample conformer, the CFM
estimator (10 Euler steps x CFG pair), or HiFT-GAN. This times the stages
separately at the PRODUCT sub-batch shape:

  1. token_to_wav       (everything, the product dispatch)
  2. flow_to_mel        (conformer + encoder_proj + CFM solve)
  3. cfm.generate_mel   (CFM solve alone, same (B, T_mel, 80) shapes)
  4. hifigan.inference  (vocoder alone, same mel shape)

conformer+proj ~= (2) - (3); the column should roughly add up to (1) —
a big residual means the decomposition is lying (shapes drifted).

Timing rules for the axon tunnel (PERF_NOTES "TIMING TRAPS"): every timed
call gets FRESH inputs (the remote backend memoizes identical executions)
and ends with a host fetch of result bytes. The ~20-30 ms fetch RTT is
charged to every stage equally, so stage SHARES are trustworthy while
absolute numbers carry that constant.

Optionally wraps a device trace around the token_to_wav call (--trace-dir)
for op-level drill-down via scripts/analyze_decode_trace.py.

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_s3gen.py \
      [--rows 16] [--tokens 250] [--iters 3] [--cfm-cache 0] [--int8]
      [--trace-dir /tmp/jax_trace_s3gen]
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
    ap.add_argument("--rows", type=int, default=16,
                    help="utterance rows per dispatch (product sub-batch)")
    ap.add_argument("--tokens", type=int, default=250)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cfm-cache", type=int, default=0,
                    help="DeepCache stride K for the CFM stages")
    ap.add_argument("--cfg-steps", type=int, default=0,
                    help="CFG-interval truncation k (0 = CFG every step)")
    ap.add_argument("--int8", action="store_true",
                    help="weight-only int8 conformer+estimator linears")
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny config on CPU (plumbing check only)")
    args = ap.parse_args()

    if args.smoke:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from chatterbox_embed_tpu.config import S3GenConfig
    from chatterbox_embed_tpu.models import cfm as cfm_mod
    from chatterbox_embed_tpu.models import hifigan
    from chatterbox_embed_tpu.models import s3gen as s3gen_mod
    from chatterbox_embed_tpu.utils.device import init_on_cpu, to_default_device

    if args.smoke:
        from chatterbox_embed_tpu.config import (ConformerConfig,
                                                 FlowDecoderConfig, HiFTConfig,
                                                 S3TokenizerConfig, replace)
        cfg = S3GenConfig(
            flow=replace(S3GenConfig().flow,
                         encoder=ConformerConfig(input_size=32, output_size=32,
                                                 attention_heads=4,
                                                 linear_units=64, num_blocks=1,
                                                 num_up_blocks=1),
                         decoder=FlowDecoderConfig(in_channels=32,
                                                   out_channels=8, channels=16,
                                                   attention_head_dim=8,
                                                   num_heads=2, n_blocks=1,
                                                   num_mid_blocks=1,
                                                   time_embed_dim=64),
                         input_size=32, output_size=8),
            hift=HiFTConfig(in_channels=8, base_channels=32,
                            f0_cond_channels=16),
            tokenizer=S3TokenizerConfig(n_state=64, n_heads=4, n_layers=1),
            mel_num=8)
        args.tokens = min(args.tokens, 24)
        args.rows = min(args.rows, 2)
    else:
        cfg = S3GenConfig()
    dtype = jnp.float32 if args.smoke else jnp.bfloat16
    rng = np.random.default_rng(0)
    t0 = time.time()
    params = init_on_cpu(s3gen_mod.init, jax.random.PRNGKey(1), cfg)
    if args.int8:
        from chatterbox_embed_tpu.utils.quantize import quantize_s3gen
        params = quantize_s3gen(params)
    if dtype == jnp.bfloat16:
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == np.float32 else x,
            params)
    params = to_default_device(params)
    jax.block_until_ready(params)
    print(f"[s3prof] params ready {time.time() - t0:.1f}s", file=sys.stderr)

    b, n_tok, n_prompt = args.rows, args.tokens, 150
    k = args.cfm_cache
    kc = args.cfg_steps or None
    t_mel = 2 * (n_prompt + n_tok)

    def fresh_inputs(seed):
        r = np.random.default_rng(seed)
        return dict(
            tokens=jnp.asarray(r.integers(0, 6561, (b, n_tok)), jnp.int32),
            token_len=jnp.asarray(np.full((b,), n_prompt + n_tok), jnp.int32),
            prompt_tokens=jnp.asarray(r.integers(0, 6561, (b, n_prompt)),
                                      jnp.int32),
            prompt_feat=jnp.asarray(
                r.standard_normal((b, 2 * n_prompt, cfg.mel_num)), jnp.float32),
            embedding=jnp.asarray(
                r.standard_normal((b, cfg.flow.spk_embed_dim)), jnp.float32),
            mu=jnp.asarray(r.standard_normal((b, t_mel, cfg.mel_num)),
                           jnp.float32),
            spks=jnp.asarray(r.standard_normal((b, cfg.flow.output_size)),
                             jnp.float32),
            conds=jnp.zeros((b, t_mel, cfg.mel_num), jnp.float32),
            # the product vocoder input is the GENERATED region only
            # (token_to_wav strips the prompt frames: mel[:, mel_len1:])
            mel=jnp.asarray(r.standard_normal((b, 2 * n_tok, cfg.mel_num)),
                            jnp.float32),
        )

    _cfm_jit = jax.jit(lambda p, mu, spks, conds: cfm_mod.generate_mel(
        p, mu, spks, conds, cfm=cfg.flow.cfm, dec_cfg=cfg.flow.decoder,
        dtype=dtype, cache_every=k, cfg_steps=kc))
    _hift_jit = jax.jit(lambda p, mel: hifigan.inference(
        p, mel, key=jax.random.PRNGKey(0), cfg=cfg.hift, dtype=dtype)[0])

    stages = {
        "token_to_wav": lambda i: s3gen_mod.token_to_wav(
            params, i["tokens"], i["token_len"], i["prompt_tokens"],
            i["prompt_feat"], i["embedding"], cfg=cfg, dtype=dtype,
            cache_every=k, cfg_steps=kc),
        "flow_to_mel": lambda i: s3gen_mod.flow_to_mel(
            params, i["tokens"], i["token_len"], i["prompt_tokens"],
            i["prompt_feat"], i["embedding"], cfg=cfg, dtype=dtype,
            cache_every=k, cfg_steps=kc),
        "cfm_only": lambda i: _cfm_jit(
            params["flow"]["decoder"], i["mu"], i["spks"], i["conds"]),
        "hifigan_only": lambda i: _hift_jit(params["hift"], i["mel"]),
    }

    results = {}
    seed = 100
    for name, fn in stages.items():
        fn(fresh_inputs(seed)); seed += 1            # compile + warm
        jax.block_until_ready(params)
        times = []
        for _ in range(args.iters):
            inp = fresh_inputs(seed); seed += 1
            jax.block_until_ready(list(inp.values()))
            t1 = time.time()
            out = fn(inp)
            # completion barrier: fetch a tiny DEPENDENT slice (fetching the
            # full wav would add seconds of ~6-35 MB/s tunnel transfer;
            # block_until_ready alone is not reliable here — PERF_NOTES traps)
            np.asarray(jax.tree.leaves(out)[0][:1, :8])
            times.append(time.time() - t1)
        results[name] = float(np.median(times))
        print(f"[s3prof] {name:14s} {results[name]:.3f}s "
              f"(iters {['%.3f' % t for t in times]})", file=sys.stderr)

    if args.trace_dir:
        os.makedirs(args.trace_dir, exist_ok=True)
        inp = fresh_inputs(seed); seed += 1
        jax.profiler.start_trace(args.trace_dir)
        out = stages["token_to_wav"](inp)
        np.asarray(out[:1, :8])
        jax.profiler.stop_trace()
        print(f"[s3prof] trace written to {args.trace_dir}", file=sys.stderr)

    conf = results["flow_to_mel"] - results["cfm_only"]
    resid = results["token_to_wav"] - results["flow_to_mel"] - results["hifigan_only"]
    summary = {
        "rows": b, "tokens": n_tok, "t_mel": t_mel, "cfm_cache": k,
        "cfg_steps": kc,
        "int8": args.int8, "iters": args.iters,
        "total_s": results["token_to_wav"],
        "cfm_s": results["cfm_only"],
        "conformer_proj_s": conf,
        "hifigan_s": results["hifigan_only"],
        "decomposition_residual_s": resid,
        "shares": {
            "cfm": results["cfm_only"] / results["token_to_wav"],
            "conformer_proj": conf / results["token_to_wav"],
            "hifigan": results["hifigan_only"] / results["token_to_wav"],
        },
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
