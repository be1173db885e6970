"""Full-size TPU drive of the pooled-jobs serving path (dynamic batching).

`generate_long_text_batch` (chunk -> pooled multi-voice lock-step decode ->
batched S3Gen -> stitch -> watermark, per job) is covered by CPU tests at
toy size; this drives it ONCE at full size on the real chip — the class of
bug it exists to catch is device-placement/trace issues that only appear
on the non-CPU backend (round 4's "streaming on a mesh-enabled instance"
crash was exactly that). Random weights: the audio is noise, but shapes,
finiteness, per-job isolation and the watermark step are all real.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/serving_smoke_tpu.py
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from chatterbox_embed_tpu.config import ChatterboxConfig
    from chatterbox_embed_tpu.conditionals import Conditionals
    from chatterbox_embed_tpu.models import s3gen as s3gen_mod
    from chatterbox_embed_tpu.models import t3 as t3_mod
    from chatterbox_embed_tpu.tts import ChatterboxTTS, _FallbackTokenizer
    from chatterbox_embed_tpu.utils.device import (enable_compilation_cache,
                                                   init_on_cpu,
                                                   to_default_device)
    from chatterbox_embed_tpu.utils.quantize import quantize_t3

    enable_compilation_cache()
    cfg = ChatterboxConfig()
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    k = jax.random.split(jax.random.PRNGKey(0), 2)

    t0 = time.time()
    t3_params = quantize_t3(init_on_cpu(t3_mod.init, k[0], cfg.t3))
    s3_params = init_on_cpu(s3gen_mod.init, k[1], cfg.s3gen)
    cast = lambda t: jax.tree.map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16) if x.dtype == np.float32 else x, t)
    t3_params = to_default_device(cast(t3_params))
    s3_params = to_default_device(cast(s3_params))
    jax.block_until_ready((t3_params, s3_params))
    print(f"[smoke] params {time.time() - t0:.1f}s", file=sys.stderr)

    def voice(seed):
        r = np.random.default_rng(seed)
        n_prompt = 150
        cond = t3_mod.T3Cond(
            speaker_emb=jnp.asarray(
                r.standard_normal((1, cfg.t3.speaker_embed_size)), jnp.float32),
            cond_prompt_speech_tokens=jnp.asarray(
                r.integers(0, 6561, (1, cfg.t3.speech_cond_prompt_len)), jnp.int32),
            emotion_adv=0.5)
        gen = dict(prompt_token=r.integers(0, 6561, (1, n_prompt)),
                   prompt_token_len=np.asarray([n_prompt]),
                   prompt_feat=r.standard_normal((1, 2 * n_prompt,
                                                  cfg.s3gen.mel_num)).astype(np.float32),
                   prompt_feat_len=None,
                   embedding=r.standard_normal((1, cfg.s3gen.flow.spk_embed_dim
                                                )).astype(np.float32))
        return Conditionals(cond, gen)

    tts = ChatterboxTTS(t3_params, s3_params, None, _FallbackTokenizer(cfg.t3),
                        config=cfg, dtype=dtype)

    sent = ("The quick brown fox jumps over the lazy dog while the river "
            "keeps rolling toward the quiet valley below the hills. ")
    stories = [sent * 6, sent * 5, sent * 7]          # 2 chunks per story
    conds = [voice(1), voice(2), voice(1)]            # jobs 0 and 2 share a voice

    t0 = time.time()
    results = tts.generate_long_text_batch(
        stories, conds_list=conds, exaggeration=[0.4, 0.5, 0.6],
        temperature=0.7, cfg_weight=0.6, seed=3, max_new_tokens=220)
    wall = time.time() - t0

    report = {"jobs": len(results), "wall_s": round(wall, 2), "ok": True}
    total_audio = 0.0
    for i, (wav, meta) in enumerate(results):
        if wav is None:
            report["ok"] = False
            report[f"job{i}_error"] = meta.get("error")
            continue
        assert np.isfinite(wav).all(), f"job {i}: non-finite audio"
        assert wav.shape[0] == 1 and wav.shape[1] > 24000, f"job {i}: {wav.shape}"
        total_audio += meta["duration_s"]
        report[f"job{i}"] = {"duration_s": round(meta["duration_s"], 2),
                             "chunks": meta["num_chunks"],
                             "perf_keys": sorted(meta.get("perf", {}).keys())[:4]}
    report["audio_s_total"] = round(total_audio, 1)
    report["rtf_jobs"] = round(wall / max(total_audio, 1e-9), 4)
    print(json.dumps(report))
    if not report["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
