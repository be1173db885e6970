"""End-to-end TTS benchmark: real-time factor on the target accelerator.

Measures the full synthesis path at production shapes — T3 autoregressive
decode (fused-CFG, 30-layer Llama, on-device sampling) followed by S3Gen
(conformer + 10-step CFM + HiFT vocoder) — with random weights (HF
checkpoints are unreachable in this environment; FLOPs and memory traffic
are identical to converted weights).

Prints ONE JSON line. The DEFAULT full-size invocation (what the driver
runs) measures the three headline cells in ONE session (shared init /
transfer / warm device): the single-utterance RTF (headline `value`), the
batch-32 throughput RTF (BASELINE.md "batch: 32 sentences" config under the
shipped defaults: int8 weights, int8 KV, derived CFM cache), and the
streaming time-to-first-audio p50 — round-4 verdict item 2: the
throughput/latency headlines must live in the driver-recorded bench, not
only in builder-run measurement files.

  {"metric": "rtf", "value": <wall/audio>, "unit": "wall_s/audio_s",
   "vs_baseline": <0.1/rtf>, "cells": [
     {"name": "rtf_b1", ...}, {"name": "rtf_b32", ...}, {"name": "ttfa", ...}]}

Baseline: the BASELINE.md target RTF < 0.1 per chip; vs_baseline > 1 beats it.

Usage:
  python bench.py              # full-size, all three cells (TPU)
  python bench.py --smoke      # tiny model on CPU (CI / correctness check)
  python bench.py --batch 32 --tokens 1000   # ONE explicit cell (A/B scripts)
  python bench.py --stream     # ONE explicit TTFA cell
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
    ap.add_argument("--batch", type=int, default=None,
                    help="utterances decoded in lock-step (throughput mode); "
                         "passing this runs ONE explicit cell")
    ap.add_argument("--stream", action="store_true",
                    help="measure ONLY time-to-first-audio via the streaming path")
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

    # default full run = the three headline cells; any explicit shape/mode
    # selection (A/B measurement scripts) or smoke runs exactly one cell
    multi_cell = (not args.smoke and not args.stream and args.batch is None
                  and args.tokens == 250
                  and os.getenv("CHATTERBOX_BENCH_CELLS", "1") != "0")
    if args.batch is None:
        args.batch = 1

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

    platform = jax.devices()[0].platform

    def run_cell(u: int, tokens: int, iters: int) -> dict:
        """Warm up + time `iters` full synthesis passes at (batch=u, tokens)."""
        stage = {"t3": 0.0, "s3gen": 0.0}
        text_b = np.broadcast_to(text, (u, text.shape[1])).copy()

        def synthesize(seed: int):
            t_a = time.time()
            # one decode_block per request: through a high-latency tunnel each
            # extra block costs a full host round-trip (microbench: the raw loop
            # is 2.1 ms/step; the rest of round-1's 3.5 ms/step was dispatch)
            tok_lists = t3_mod.generate_batch(
                t3_params, cond, text_b, max_new_tokens=tokens,
                temperature=0.7, cfg_weight=0.5, stop_on_eos=False,
                seed=seed, block=tokens, cfg=cfg.t3, dtype=dtype)
            stage["t3"] = time.time() - t_a
            pad = np.zeros((u, tokens), np.int32)
            for i, toks in enumerate(tok_lists):
                n = min(len(toks), tokens)
                pad[i, :n] = toks[:n]
            token_len = jnp.asarray([n_prompt + tokens])
            t_a = time.time()
            # s3gen sub-batching (CFM attention memory; see tts.generate_batch).
            # Derived from T_mel + free HBM; CHATTERBOX_S3GEN_SUB_BATCH overrides.
            from chatterbox_embed_tpu.tts import (_derive_cfm_cache,
                                                  _derive_s3gen_sub_batch)
            sub = _derive_s3gen_sub_batch(u, n_prompt + tokens, cfg.s3gen)
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

        t0 = time.time()
        wav = synthesize(0)
        compile_s = time.time() - t0
        print(f"[bench] b{u} compile+first-run {compile_s:.1f}s", file=sys.stderr)
        times, t3_iters, s3_iters = [], [], []
        for i in range(iters):
            t0 = time.time()
            wav = synthesize(i + 1)
            times.append(time.time() - t0)
            t3_iters.append(round(stage["t3"], 4))
            s3_iters.append(round(stage["s3gen"], 4))
        audio_sec = u * tokens / 25.0
        wall = float(np.median(times))
        rtf = wall / audio_sec

        # Falsifiability: record the static decode decisions and fail LOUDLY if
        # the Pallas kernel silently fell back where it was expected to engage
        # (round-1 lesson: an unobserved fallback is indistinguishable from pool
        # variance in the headline number).
        gen_info = dict(t3_mod.LAST_GENERATION_INFO)
        expect_flash = (platform not in ("cpu",)
                        and u <= t3_mod.FLASH_DECODE_MAX_UTTERANCES
                        and os.getenv("CHATTERBOX_PALLAS") != "0")
        if expect_flash and not gen_info.get("use_flash", False):
            print("[bench] ERROR: Pallas flash decode expected but NOT engaged",
                  file=sys.stderr)
            sys.exit(3)
        return {
            "name": f"rtf_b{u}",
            "metric": "rtf",
            "value": round(rtf, 5),
            "unit": "wall_s/audio_s",
            "vs_baseline": round(0.1 / rtf, 3),
            "audio_s": audio_sec,
            "wall_s_median": round(wall, 4),
            "compile_s": round(compile_s, 1),
            "iters": iters,
            "wav_samples": int(wav.size),
            "t3_s": round(float(np.median(t3_iters)), 4),
            "s3gen_s": round(float(np.median(s3_iters)), 4),
            "t3_s_iters": t3_iters,
            "s3gen_s_iters": s3_iters,
            "t3_ms_per_step": round(1000.0 * float(np.median(t3_iters)) / tokens, 3),
            "use_flash": gen_info.get("use_flash"),
            "cache_total": gen_info.get("cache_total"),
            "phase_totals": gen_info.get("phase_totals"),
            "batch": u,
            "tokens": tokens,
            "kv_int8": gen_info.get("kv_int8"),
            "decode_sub_batches": gen_info.get("decode_sub_batches", 1),
            "s3gen_sub_batch": int(stage.get("s3gen_sub", 0)),
            "cfm_cache": int(stage.get("cfm_cache", 0)),
        }

    if args.stream:
        cell = measure_ttfa(args, cfg, dtype, t3_params, s3_params, cond,
                            n_prompt, prompt_tokens, prompt_feat, embedding)
        print(json.dumps({
            "metric": "ttfa_p50", "value": cell["value"], "unit": "s",
            "vs_baseline": round(0.2 / cell["value"], 3),
            "detail": cell}))
        return

    if multi_cell:
        # one session, three headline cells: shared init/transfer above, the
        # models stay resident between cells (B=1 first so its compile wins
        # the warm cache; B=32 is the BASELINE batch config; TTFA last)
        cells = [run_cell(1, args.tokens, args.iters),
                 run_cell(32, args.tokens, args.iters)]
        cells.append(measure_ttfa(args, cfg, dtype, t3_params, s3_params,
                                  cond, n_prompt, prompt_tokens, prompt_feat,
                                  embedding))
        head = cells[0]
        result = {
            "metric": "rtf",
            "value": head["value"],
            "unit": "wall_s/audio_s",
            "vs_baseline": head["vs_baseline"],
            "cells": cells,
            "detail": {
                "device": str(jax.devices()[0]),
                "mode": "full",
                "int8": args.int8,
                "int8_s3gen": args.int8_s3gen,
                "rtf_b32": cells[1]["value"],
                "ttfa_p50_s": cells[2]["value"],
            },
        }
        print(json.dumps(result))
        return

    cell = run_cell(args.batch, args.tokens, args.iters)
    result = {
        "metric": "rtf",
        "value": cell["value"],
        "unit": "wall_s/audio_s",
        "vs_baseline": cell["vs_baseline"],
        "detail": dict(cell, device=str(jax.devices()[0]),
                       mode="smoke" if args.smoke else "full",
                       int8=args.int8, int8_s3gen=args.int8_s3gen),
    }
    print(json.dumps(result))


def measure_ttfa(args, cfg, dtype, t3_params, s3_params, cond,
                 n_prompt, prompt_tokens, prompt_feat, embedding) -> dict:
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

    t0 = time.time()
    w = first_audio(0)  # compile
    print(f"[bench] ttfa compile+first-run {time.time() - t0:.1f}s",
          file=sys.stderr)
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
    return {"name": "ttfa", "metric": "ttfa_p50",
            "value": round(ttfa, 4), "unit": "s",
            "vs_baseline": round(0.2 / ttfa, 3),
            "block_tokens": block, "first_chunk_samples": int(w.size),
            "iters": args.iters, "fused_dispatch": True, "through_api": True,
            "use_flash": gen_info.get("use_flash")}


if __name__ == "__main__":
    main()
