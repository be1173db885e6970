"""End-to-end TTS benchmark: real-time factor on the target accelerator.

Measures the full synthesis path at production shapes — T3 autoregressive
decode (fused-CFG, 30-layer Llama, on-device sampling) followed by S3Gen
(conformer + 10-step CFM + HiFT vocoder) — with random weights (HF
checkpoints are unreachable in this environment; FLOPs and memory traffic
are identical to converted weights).

Prints ONE JSON line:
  {"metric": "rtf", "value": <wall_sec / audio_sec>, "unit": "wall_s/audio_s",
   "vs_baseline": <0.1 / rtf>}
Baseline: the BASELINE.md target RTF < 0.1 per chip; vs_baseline > 1 beats it.

Usage:
  python bench.py              # full-size model on the default device (TPU)
  python bench.py --smoke      # tiny model on CPU (CI / correctness check)
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
    ap.add_argument("--smoke", action="store_true", help="tiny config on CPU")
    ap.add_argument("--tokens", type=int, default=250,
                    help="speech tokens per utterance (25/s; 250 = 10 s audio)")
    ap.add_argument("--text-len", type=int, default=96, help="text tokens")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--batch", type=int, default=1,
                    help="utterances decoded in lock-step (throughput mode)")
    ap.add_argument("--stream", action="store_true",
                    help="measure time-to-first-audio via the streaming path")
    ap.add_argument("--int8", action="store_true", default=None,
                    help="int8-quantized T3 backbone weights (DEFAULT ON for TPU "
                         "since round 4 — gated by scripts/int8_quality_gate.py; "
                         "kill-switch --no-int8 / CHATTERBOX_INT8=0)")
    ap.add_argument("--no-int8", dest="int8", action="store_false")
    ap.add_argument("--int8-s3gen", action="store_true",
                    help="int8 conformer + CFM-estimator linears (utils.quantize.quantize_s3gen)")
    ap.add_argument("--int8-kv", action="store_true",
                    help="int8 KV cache for the batched XLA decode "
                         "(CHATTERBOX_INT8_KV=1; flash/fused paths keep bf16 slabs)")
    args = ap.parse_args()

    if args.smoke:
        os.environ["JAX_PLATFORMS"] = "cpu"
    if args.int8_kv and not os.getenv("CHATTERBOX_INT8_KV"):
        os.environ["CHATTERBOX_INT8_KV"] = "1"   # CHATTERBOX_INT8_KV=2 for mode 2

    import jax
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from chatterbox_embed_tpu.utils.device import enable_compilation_cache
    enable_compilation_cache()   # repeat runs skip the ~2 min compile phase
    from chatterbox_embed_tpu.config import (ChatterboxConfig, T3Config, LlamaConfig,
                                             S3GenConfig, S3TokenizerConfig,
                                             ConformerConfig, FlowDecoderConfig,
                                             HiFTConfig, replace)
    from chatterbox_embed_tpu.models import t3 as t3_mod
    from chatterbox_embed_tpu.models import s3gen as s3gen_mod

    if args.smoke:
        cfg = ChatterboxConfig(
            t3=T3Config(llama=LlamaConfig(hidden_size=64, intermediate_size=128,
                                          num_layers=2, num_heads=4, num_kv_heads=4,
                                          head_dim=16),
                        max_text_tokens=64, max_speech_tokens=128,
                        speech_cond_prompt_len=8),
            s3gen=S3GenConfig(
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
                mel_num=8),
        )
        args.tokens = min(args.tokens, 48)
        args.text_len = min(args.text_len, 40)
        dtype = jnp.float32
    else:
        cfg = ChatterboxConfig()
        dtype = jnp.bfloat16

    from chatterbox_embed_tpu.utils.device import init_on_cpu, to_default_device
    rng = np.random.default_rng(0)
    k = jax.random.split(jax.random.PRNGKey(0), 2)

    def cast_params(tree):
        if dtype == jnp.float32:
            return tree
        # ship bf16 over the wire: halves transfer bytes; inference runs the
        # backbone in bf16 anyway (reference torch_dtype=bfloat16)
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tree)

    if args.int8 is None:
        # round-4 default: int8 T3 decode ON for TPU (1.94-2.03 ms/step vs
        # 2.3-2.4 bf16; promotion gate numbers in PERF_NOTES). CPU/smoke
        # stays fp (no weight-streaming bound there).
        args.int8 = (jax.devices()[0].platform not in ("cpu",)
                     and os.getenv("CHATTERBOX_INT8", "1") != "0")

    t0 = time.time()
    t3_params = init_on_cpu(t3_mod.init, k[0], cfg.t3)
    s3_params = init_on_cpu(s3gen_mod.init, k[1], cfg.s3gen)
    if args.int8:
        from chatterbox_embed_tpu.utils.quantize import quantize_t3
        t3_params = quantize_t3(t3_params)
    if args.int8_s3gen:
        from chatterbox_embed_tpu.utils.quantize import quantize_s3gen
        s3_params = quantize_s3gen(s3_params)
    print(f"[bench] init {time.time() - t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    t3_params = to_default_device(cast_params(t3_params))
    s3_params = to_default_device(cast_params(s3_params))
    jax.block_until_ready((t3_params, s3_params))
    print(f"[bench] transfer {time.time() - t0:.1f}s", file=sys.stderr)

    cond = t3_mod.T3Cond(
        speaker_emb=jnp.asarray(rng.standard_normal((1, cfg.t3.speaker_embed_size)),
                                jnp.float32),
        cond_prompt_speech_tokens=jnp.asarray(
            rng.integers(0, 6561, (1, cfg.t3.speech_cond_prompt_len)), jnp.int32),
        emotion_adv=0.5)
    text = np.concatenate([[cfg.t3.start_text_token],
                           rng.integers(1, cfg.t3.text_tokens_dict_size,
                                        args.text_len - 2),
                           [cfg.t3.stop_text_token]]).astype(np.int32)[None]

    n_prompt = 8 if args.smoke else 150
    prompt_tokens = jnp.asarray(rng.integers(0, 6561, (1, n_prompt)), jnp.int32)
    prompt_feat = jnp.asarray(rng.standard_normal((1, 2 * n_prompt, cfg.s3gen.mel_num)),
                              jnp.float32)
    embedding = jnp.asarray(rng.standard_normal((1, cfg.s3gen.flow.spk_embed_dim)),
                            jnp.float32)

    stage = {"t3": 0.0, "s3gen": 0.0}

    u = args.batch
    text_b = np.broadcast_to(text, (u, text.shape[1])).copy()

    def synthesize(seed: int):
        t_a = time.time()
        # one decode_block per request: through a high-latency tunnel each
        # extra block costs a full host round-trip (microbench: the raw loop
        # is 2.1 ms/step; the rest of round-1's 3.5 ms/step was dispatch)
        tok_lists = t3_mod.generate_batch(
            t3_params, cond, text_b, max_new_tokens=args.tokens,
            temperature=0.7, cfg_weight=0.5, stop_on_eos=False,
            seed=seed, block=args.tokens, cfg=cfg.t3, dtype=dtype)
        stage["t3"] = time.time() - t_a
        pad = np.zeros((u, args.tokens), np.int32)
        for i, toks in enumerate(tok_lists):
            n = min(len(toks), args.tokens)
            pad[i, :n] = toks[:n]
        token_len = jnp.asarray([n_prompt + args.tokens])
        t_a = time.time()
        # s3gen sub-batching (CFM attention memory; see tts.generate_batch).
        # Derived from T_mel + free HBM; CHATTERBOX_S3GEN_SUB_BATCH overrides.
        from chatterbox_embed_tpu.tts import (_derive_cfm_cache,
                                              _derive_s3gen_sub_batch)
        sub = _derive_s3gen_sub_batch(u, n_prompt + args.tokens, cfg.s3gen)
        stage["s3gen_sub"] = sub
        # CFM DeepCache stride: SAME default as the product path
        # (tts.generate_batch derives K=2 for >= 8 live rows/dispatch;
        # CHATTERBOX_CFM_CACHE overrides) — without this the batched bench
        # silently measured the exact solver the product no longer runs.
        cfm_stride = _derive_cfm_cache(min(sub, u))
        stage["cfm_cache"] = cfm_stride
        # enqueue EVERY sub-batch before fetching (dispatches are async, so
        # the tens-of-MB wav fetch of dispatch N overlaps compute of N+1 —
        # same as tts._vocode_batch); one hoisted PRNGKey, not one per
        # dispatch (each eager op is an RTT through the tunnel)
        key = jax.random.PRNGKey(seed)
        wavs = []
        for s0 in range(0, u, sub):
            b = min(sub, u - s0)
            pt = jnp.broadcast_to(prompt_tokens, (b,) + prompt_tokens.shape[1:])
            pf = jnp.broadcast_to(prompt_feat, (b,) + prompt_feat.shape[1:])
            em = jnp.broadcast_to(embedding, (b,) + embedding.shape[1:])
            tl = jnp.broadcast_to(token_len, (b,))
            wavs.append(s3gen_mod.token_to_wav(
                s3_params, jnp.asarray(pad[s0:s0 + b]), tl, pt, pf, em,
                key=key, cfg=cfg.s3gen, dtype=dtype, cache_every=cfm_stride))
        wav = np.concatenate([np.asarray(w) for w in wavs], axis=0)
        stage["s3gen"] = time.time() - t_a
        return wav

    if args.stream:
        return bench_stream(args, cfg, dtype, t3_params, s3_params, cond, text,
                            n_prompt, prompt_tokens, prompt_feat, embedding)

    # warmup / compile
    t0 = time.time()
    wav = synthesize(0)
    compile_s = time.time() - t0
    print(f"[bench] compile+first-run {compile_s:.1f}s", file=sys.stderr)

    times = []
    for i in range(args.iters):
        t0 = time.time()
        wav = synthesize(i + 1)
        times.append(time.time() - t0)

    audio_sec = args.batch * args.tokens / 25.0
    wall = float(np.median(times))
    rtf = wall / audio_sec

    # Falsifiability: record the static decode decisions and fail LOUDLY if
    # the Pallas kernel silently fell back where it was expected to engage
    # (round-1 lesson: an unobserved fallback is indistinguishable from pool
    # variance in the headline number).
    gen_info = dict(t3_mod.LAST_GENERATION_INFO)
    platform = jax.devices()[0].platform
    expect_flash = (platform not in ("cpu",)
                    and args.batch <= t3_mod.FLASH_DECODE_MAX_UTTERANCES
                    and os.getenv("CHATTERBOX_PALLAS") != "0")
    if expect_flash and not gen_info.get("use_flash", False):
        print("[bench] ERROR: Pallas flash decode expected but NOT engaged",
              file=sys.stderr)
        sys.exit(3)

    result = {
        "metric": "rtf",
        "value": round(rtf, 5),
        "unit": "wall_s/audio_s",
        "vs_baseline": round(0.1 / rtf, 3),
        "detail": {
            "audio_s": audio_sec,
            "wall_s_median": round(wall, 4),
            "compile_s": round(compile_s, 1),
            "iters": args.iters,
            "device": str(jax.devices()[0]),
            "mode": "smoke" if args.smoke else "full",
            "wav_samples": int(wav.size),
            "t3_s": round(stage["t3"], 4),
            "s3gen_s": round(stage["s3gen"], 4),
            "t3_ms_per_step": round(1000.0 * stage["t3"] / args.tokens, 3),
            "use_flash": gen_info.get("use_flash"),
            "cache_total": gen_info.get("cache_total"),
            "batch": args.batch,
            "int8": args.int8,
            "int8_s3gen": args.int8_s3gen,
            "kv_int8": gen_info.get("kv_int8"),
            "s3gen_sub_batch": int(stage.get("s3gen_sub", 0)),
            "cfm_cache": int(stage.get("cfm_cache", 0)),
        },
    }
    print(json.dumps(result))


def bench_stream(args, cfg, dtype, t3_params, s3_params, cond, text,
                 n_prompt, prompt_tokens, prompt_feat, embedding):
    """p50 time-to-first-audio (BASELINE.md stretch goal: < 200 ms),
    measured THROUGH the public API: ChatterboxTTS.stream_generate's first
    yielded chunk is the fused one-dispatch program (streaming.first_chunk —
    prefill, 25-token decode, windowed flow, vocoder in a single device
    round-trip). The timer covers tokenization + host prep + the dispatch,
    i.e. exactly what a serving caller experiences."""
    import jax
    from chatterbox_embed_tpu.tts import ChatterboxTTS, _FallbackTokenizer
    from chatterbox_embed_tpu.conditionals import Conditionals
    from chatterbox_embed_tpu.models import t3 as t3_mod

    block = int(os.getenv("CHATTERBOX_TTFA_BLOCK", "25"))  # tokens in first chunk
    gen = dict(prompt_token=np.asarray(prompt_tokens),
               prompt_token_len=np.asarray([n_prompt]),
               prompt_feat=np.asarray(prompt_feat), prompt_feat_len=None,
               embedding=np.asarray(embedding))
    tts = ChatterboxTTS(t3_params, s3_params, None, _FallbackTokenizer(cfg.t3),
                        conds=Conditionals(cond, gen), config=cfg, dtype=dtype)
    # hash-tokenized bench text sized to match --text-len
    alpha = "the quick brown fox jumps over a lazy dog and keeps running on "
    text_str = (alpha * (args.text_len // len(alpha) + 1))[: max(args.text_len - 2, 4)]

    def first_audio(seed):
        it = tts.stream_generate(text_str, block_tokens=block,
                                 max_new_tokens=block, temperature=0.7,
                                 cfg_weight=0.5, seed=seed)
        for w in it:
            it.close()          # TTFA only: drop the rest of the stream
            return w
        return np.zeros((0,), np.float32)

    w = first_audio(0)  # compile
    times = []
    for i in range(args.iters):
        t0 = time.time()
        w = first_audio(i + 1)
        times.append(time.time() - t0)
    ttfa = float(np.median(times))
    gen_info = dict(t3_mod.LAST_GENERATION_INFO)
    if not gen_info.get("fused_first_chunk", False):
        print("[bench] ERROR: stream_generate did not take the fused "
              "first-chunk path", file=sys.stderr)
        sys.exit(3)
    platform = jax.devices()[0].platform
    if (platform not in ("cpu",) and os.getenv("CHATTERBOX_PALLAS") != "0"
            and not gen_info.get("use_flash", False)):
        print("[bench] ERROR: Pallas flash decode expected but NOT engaged",
              file=sys.stderr)
        sys.exit(3)
    print(json.dumps({
        "metric": "ttfa_p50",
        "value": round(ttfa, 4),
        "unit": "s",
        "vs_baseline": round(0.2 / ttfa, 3),
        "detail": {"block_tokens": block, "first_chunk_samples": int(w.size),
                   "iters": args.iters, "device": str(jax.devices()[0]),
                   "fused_dispatch": True, "through_api": True,
                   "use_flash": gen_info.get("use_flash")},
    }))


if __name__ == "__main__":
    main()
