"""Time-to-first-audio UNDER CONTINUOUS LOAD (round-5 VERDICT item 4).

The 0.136 s TTFA headline is measured on an idle chip through
stream_generate. With continuous serving the worker default, the question
that matters is: what does first-audio latency look like for a request that
joins a BUSY engine? This probe answers it with the real composed path —
`ContinuousServer.submit(stream=True)` feeds each request's slot tokens
through the same WindowedSynth flow/vocoder tail stream_generate uses, so
the audio chunks interleave with the engine's decode blocks on one chip
(honest accounting: vocode compute shares the device with decode).

Cells: Poisson arrivals at 50% and 80% of measured decode capacity
(q4y/q4z: ~1800 tokens/s at 16 slots full-size). Per request we record
  ttfa      = first take_stream() chunk  - arrival
  latency   = completed wav              - arrival
and report p50/p95 of both per load cell. Each cell runs twice (programs
warm after the first); the second run is reported.

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site timeout 5400 \
    python scripts/stream_under_load_probe.py
CPU check:   python scripts/stream_under_load_probe.py --smoke
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
    ap.add_argument("--block", type=int, default=25,
                    help="engine block size — bounds best-case TTFA")
    ap.add_argument("--requests", type=int, default=24)
    ap.add_argument("--req-tokens", type=int, default=250)
    ap.add_argument("--loads", default="0.5,0.8")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--out", default="measurements/stream_under_load.jsonl")
    args = ap.parse_args()

    if args.smoke:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from chatterbox_embed_tpu.config import (ChatterboxConfig, T3Config,
                                             LlamaConfig, S3GenConfig,
                                             S3TokenizerConfig, ConformerConfig,
                                             FlowDecoderConfig, HiFTConfig,
                                             replace)
    from chatterbox_embed_tpu.conditionals import Conditionals
    from chatterbox_embed_tpu.models import t3 as t3_mod
    from chatterbox_embed_tpu.serving.continuous import ContinuousServer
    from chatterbox_embed_tpu.tts import ChatterboxTTS, _FallbackTokenizer
    from chatterbox_embed_tpu.utils.device import (enable_compilation_cache,
                                                   init_on_cpu,
                                                   to_default_device)
    from chatterbox_embed_tpu.models import s3gen as s3gen_mod

    enable_compilation_cache()
    if args.smoke:
        cfg = ChatterboxConfig(
            t3=T3Config(llama=LlamaConfig(hidden_size=64, intermediate_size=128,
                                          num_layers=2, num_heads=4,
                                          num_kv_heads=4, head_dim=16),
                        max_text_tokens=64, max_speech_tokens=128,
                        speech_cond_prompt_len=8),
            s3gen=S3GenConfig(
                flow=replace(S3GenConfig().flow,
                             encoder=ConformerConfig(input_size=32, output_size=32,
                                                     attention_heads=4,
                                                     linear_units=64,
                                                     num_blocks=1, num_up_blocks=1),
                             decoder=FlowDecoderConfig(in_channels=32, out_channels=8,
                                                       channels=16,
                                                       attention_head_dim=8,
                                                       num_heads=2, n_blocks=1,
                                                       num_mid_blocks=1,
                                                       time_embed_dim=64),
                             input_size=32, output_size=8),
                hift=HiFTConfig(in_channels=8, base_channels=32,
                                f0_cond_channels=16),
                tokenizer=S3TokenizerConfig(n_state=64, n_heads=4, n_layers=1),
                mel_num=8))
        args.slots, args.block, args.requests = 4, 8, 6
        args.req_tokens = 16
        text_bucket, cap_tps = 32, 120.0
        dtype = jnp.float32
    else:
        cfg = ChatterboxConfig()
        text_bucket, cap_tps = 192, 1800.0
        dtype = jnp.bfloat16

    rng = np.random.default_rng(0)
    t0 = time.time()
    k = jax.random.split(jax.random.PRNGKey(0), 2)
    t3_params = init_on_cpu(t3_mod.init, k[0], cfg.t3)
    s3_params = init_on_cpu(s3gen_mod.init, k[1], cfg.s3gen)
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    if on_tpu and os.getenv("CHATTERBOX_INT8", "1") != "0":
        from chatterbox_embed_tpu.utils.quantize import quantize_t3
        t3_params = quantize_t3(t3_params)
    cast = (lambda t: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == np.float32 else x, t)
        ) if dtype == jnp.bfloat16 else (lambda t: t)
    t3_params = to_default_device(cast(t3_params))
    s3_params = to_default_device(cast(s3_params))
    jax.block_until_ready((t3_params, s3_params))
    print(f"[sload] init+transfer {time.time() - t0:.1f}s", file=sys.stderr)

    n_prompt = 8 if args.smoke else 150
    cond = t3_mod.T3Cond(
        speaker_emb=jnp.asarray(rng.standard_normal((1, cfg.t3.speaker_embed_size)),
                                jnp.float32),
        cond_prompt_speech_tokens=jnp.asarray(
            rng.integers(0, 6561, (1, cfg.t3.speech_cond_prompt_len)), jnp.int32),
        emotion_adv=0.5)
    gen = dict(prompt_token=np.asarray(rng.integers(0, 6561, (1, n_prompt)),
                                       np.int32),
               prompt_token_len=np.asarray([n_prompt]),
               prompt_feat=rng.standard_normal(
                   (1, 2 * n_prompt, cfg.s3gen.mel_num)).astype(np.float32),
               prompt_feat_len=None,
               embedding=rng.standard_normal(
                   (1, cfg.s3gen.flow.spk_embed_dim)).astype(np.float32))
    tts = ChatterboxTTS(t3_params, s3_params, None, _FallbackTokenizer(cfg.t3),
                        conds=Conditionals(cond, gen), config=cfg, dtype=dtype)
    alpha = "the quick brown fox jumps over a lazy dog and keeps running on "
    text = (alpha * 3)[: (20 if args.smoke else 120)]

    os.makedirs(os.path.dirname(args.out), exist_ok=True)

    def emit(rec):
        line = json.dumps(rec)
        print(line)
        with open(args.out, "a") as f:
            f.write(line + "\n")

    N = args.requests

    def run_cell(tag: str, load: float, seed0: int):
        rate = load * cap_tps / float(args.req_tokens)
        arr_rng = np.random.default_rng(seed0)
        arrivals = np.cumsum(arr_rng.exponential(1.0 / rate, N))
        arrivals[0] = 0.0
        srv = ContinuousServer(tts, slots=args.slots, text_bucket=text_bucket,
                               max_new_tokens=max(args.req_tokens, args.block),
                               block=args.block, vocode_batch=8)
        t_begin = time.time()
        pending = list(range(N))
        rid_of = {}
        first_at, done_at = {}, {}
        while pending or not srv.idle:
            now = time.time() - t_begin
            for i in [i for i in pending if arrivals[i] <= now]:
                rid_of[i] = srv.submit(text, stream=True, temperature=0.7,
                                       cfg_weight=0.5, seed=seed0 + i,
                                       max_new_tokens=args.req_tokens)
                pending.remove(i)
            if srv.idle:
                time.sleep(0.002)
                continue
            finished = srv.pump()
            now = time.time() - t_begin
            for i, rid in rid_of.items():
                if i not in first_at and srv.take_stream(rid):
                    first_at[i] = now
                if i not in done_at and rid in finished:
                    done_at[i] = now
        ttfa = np.asarray([first_at[i] - arrivals[i] for i in sorted(first_at)])
        lat = np.asarray([done_at[i] - arrivals[i] for i in sorted(done_at)])
        rec = {"cell": tag, "load": load, "rate_rps": round(rate, 3),
               "requests": N, "req_tokens": args.req_tokens,
               "slots": args.slots, "block": args.block,
               "ttfa_p50_s": round(float(np.percentile(ttfa, 50)), 3),
               "ttfa_p95_s": round(float(np.percentile(ttfa, 95)), 3),
               "latency_p50_s": round(float(np.percentile(lat, 50)), 3),
               "latency_p95_s": round(float(np.percentile(lat, 95)), 3),
               "makespan_s": round(float(max(done_at.values())), 3),
               "n_first": len(first_at),
               "device": str(jax.devices()[0])}
        emit(rec)
        return rec

    for load in [float(x) for x in args.loads.split(",") if x]:
        run_cell(f"cold_stream_load{load}", load, 100)      # compile pass
        run_cell(f"stream_load{load}", load, 5000)          # reported cell


if __name__ == "__main__":
    main()
