"""Sensitivity of the windowed-streaming geometry (VERDICT r3 weak #7).

STREAM_CTX_TOKENS (C, flow window context) and STREAM_VOC_CTX_MEL (M,
vocoder mel context) were hardwired at 6/8 with no evidence of sufficiency.
This sweeps them and quantifies what the window actually changes:

- the decode token stream is geometry-independent (same seed -> same
  tokens), so streamed waveforms are comparable ACROSS geometries;
- the widest geometry is the quasi-truth reference; for each narrower C/M
  we report relative L2 divergence of the streamed waveform and mel;
- a plateau at/below the default means the default context is sufficient;
  a knee above it means the operator knob (CHATTERBOX_STREAM_CTX /
  CHATTERBOX_STREAM_VOC_CTX, read at import) actually matters.

Each geometry runs in a SUBPROCESS (the constants bind at import and the
fused first-chunk program bakes them into its compiled graph).

Usage (TPU or CPU-smoke):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/stream_geometry_sensitivity.py [--smoke]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

WORKER = r"""
import json, os, sys
import numpy as np
if os.getenv("GEO_SMOKE") == "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax
if os.getenv("GEO_SMOKE") == "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from chatterbox_embed_tpu.config import (ChatterboxConfig, T3Config, LlamaConfig,
                                         S3GenConfig, S3TokenizerConfig,
                                         ConformerConfig, FlowDecoderConfig,
                                         HiFTConfig, replace)
from chatterbox_embed_tpu.utils.device import init_on_cpu, to_default_device
from chatterbox_embed_tpu.models import t3 as t3_mod
from chatterbox_embed_tpu.models import s3gen as s3gen_mod
from chatterbox_embed_tpu.tts import ChatterboxTTS, _FallbackTokenizer
from chatterbox_embed_tpu.conditionals import Conditionals

smoke = os.getenv("GEO_SMOKE") == "1"
if smoke:
    import chatterbox_embed_tpu.models.t3 as t3m, chatterbox_embed_tpu.tts as ttsm
    t3m._TEXT_BUCKETS = (24, 48); ttsm._TOKEN_BUCKETS = (32, 64, 128)
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
            mel_num=8))
    dtype = jnp.float32
    n_prompt, max_new = 8, 48
else:
    cfg = ChatterboxConfig()
    dtype = jnp.bfloat16
    n_prompt, max_new = 150, int(os.getenv("GEO_TOKENS", "150"))

rng = np.random.default_rng(0)
k = jax.random.split(jax.random.PRNGKey(0), 2)
cast = (lambda t: jax.tree.map(
    lambda x: x.astype(jnp.bfloat16) if x.dtype == np.float32 else x, t)
    ) if dtype == jnp.bfloat16 else (lambda t: t)
t3p = to_default_device(cast(init_on_cpu(t3_mod.init, k[0], cfg.t3)))
s3p = to_default_device(cast(init_on_cpu(s3gen_mod.init, k[1], cfg.s3gen)))
cond = t3_mod.T3Cond(
    speaker_emb=jnp.asarray(rng.standard_normal((1, cfg.t3.speaker_embed_size)),
                            jnp.float32),
    cond_prompt_speech_tokens=jnp.asarray(
        rng.integers(0, 6561, (1, cfg.t3.speech_cond_prompt_len)), jnp.int32),
    emotion_adv=0.5)
gen = dict(prompt_token=rng.integers(0, 6561, (1, n_prompt)).astype(np.int32),
           prompt_token_len=np.asarray([n_prompt]),
           prompt_feat=rng.standard_normal((1, 2 * n_prompt,
                                            cfg.s3gen.mel_num)).astype(np.float32),
           prompt_feat_len=None,
           embedding=rng.standard_normal((1, cfg.s3gen.flow.spk_embed_dim)
                                         ).astype(np.float32))
tts = ChatterboxTTS(t3p, s3p, None, _FallbackTokenizer(cfg.t3),
                    conds=Conditionals(cond, gen), config=cfg, dtype=dtype)
text = ("the quick brown fox jumps over a lazy dog and keeps running on " * 4)[
    :40 if smoke else 120]
chunks = list(tts.stream_generate(text, block_tokens=8 if smoke else 25,
                                  throughput_block_tokens=16 if smoke else 100,
                                  max_new_tokens=max_new, temperature=0.7,
                                  cfg_weight=0.5, seed=3))
wav = np.concatenate(chunks) if chunks else np.zeros((0,), np.float32)
out = {"C": tts.STREAM_CTX_TOKENS, "M": tts.STREAM_VOC_CTX_MEL,
       "n_chunks": len(chunks), "n_samples": int(wav.size)}
np.save(os.environ["GEO_OUT"], wav)
print(json.dumps(out))
"""


def run_geometry(c: int, m: int, out_path: str, smoke: bool) -> dict:
    env = dict(os.environ)
    env.update(CHATTERBOX_STREAM_CTX=str(c), CHATTERBOX_STREAM_VOC_CTX=str(m),
               GEO_OUT=out_path, GEO_SMOKE="1" if smoke else "0",
               PYTHONPATH="/root/repo:/root/.axon_site")
    p = subprocess.run([sys.executable, "-c", WORKER], env=env,
                       capture_output=True, text=True, timeout=2400)
    if p.returncode != 0:
        print(p.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f"geometry C={c} M={m} failed")
    return json.loads(p.stdout.strip().splitlines()[-1])


def rel_l2(a: np.ndarray, b: np.ndarray) -> float:
    n = min(len(a), len(b))
    if n == 0:
        return 1.0
    return float(np.linalg.norm(a[:n] - b[:n]) / (np.linalg.norm(b[:n]) + 1e-12))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    # constraint: C must not exceed the first block's token count (the
    # fused first chunk's mu_tail slice starts at r*(n_tokens - C)); the
    # smoke path uses block_tokens=8, full-size uses 25
    cs = [4, 6, 8] if args.smoke else [4, 6, 9, 12]
    ms = [4, 8, 12] if args.smoke else [4, 8, 16]
    ref_c, ref_m = max(cs), max(ms)
    rows = []
    # C sweep at M=ref_m: reference = widest C (isolates the flow context)
    ref_path = "/tmp/geo_ref_c.npy"
    meta = run_geometry(ref_c, ref_m, ref_path, args.smoke)
    ref = np.load(ref_path)
    print(f"[geo] C-sweep reference C={ref_c} M={ref_m}: {meta}", file=sys.stderr)
    for c in cs:
        path = f"/tmp/geo_c{c}.npy"
        meta = run_geometry(c, ref_m, path, args.smoke)
        rows.append({"sweep": "C", "C": c, "M": ref_m,
                     "rel_l2_vs_widest": rel_l2(np.load(path), ref), **meta})
        print(f"[geo] {rows[-1]}", file=sys.stderr)
    # M sweep at the default C=6: reference = widest M (isolates the
    # vocoder context)
    ref_path = "/tmp/geo_ref_m.npy"
    meta = run_geometry(6, ref_m, ref_path, args.smoke)
    ref = np.load(ref_path)
    print(f"[geo] M-sweep reference C=6 M={ref_m}: {meta}", file=sys.stderr)
    for m in ms:
        path = f"/tmp/geo_m{m}.npy"
        meta = run_geometry(6, m, path, args.smoke)
        rows.append({"sweep": "M", "C": 6, "M": m,
                     "rel_l2_vs_widest": rel_l2(np.load(path), ref), **meta})
        print(f"[geo] {rows[-1]}", file=sys.stderr)
    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
