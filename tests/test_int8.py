"""int8 T3 backbone: mechanism validation (utils/quantize.py).

True quality sign-off needs converted production weights (unreachable in
this zero-egress container) — what CAN be pinned down is that the
quantize/dequantize path is numerically faithful: per-channel scales applied
on the right axis, logits close to the fp path, generation well-formed, and
the decode fence behavior unchanged."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chatterbox_embed_tpu.config import T3Config, LlamaConfig
from chatterbox_embed_tpu.models import t3
from chatterbox_embed_tpu.utils.quantize import quantize_t3

TINY = T3Config(
    llama=LlamaConfig(hidden_size=64, intermediate_size=128, num_layers=2,
                      num_heads=4, num_kv_heads=4, head_dim=16),
    text_tokens_dict_size=50, speech_tokens_dict_size=40,
    start_speech_token=36, stop_speech_token=37,
    max_text_tokens=64, max_speech_tokens=128,
    speaker_embed_size=16, speech_cond_prompt_len=6)


@pytest.fixture(scope="module")
def pair():
    params = t3.init(jax.random.PRNGKey(0), TINY)
    return params, quantize_t3(params)


def _cond(rng):
    return t3.T3Cond(
        speaker_emb=jnp.asarray(rng.standard_normal((1, 16)).astype(np.float32)),
        cond_prompt_speech_tokens=jnp.asarray(rng.integers(0, 36, (1, 6)).astype(np.int32)),
        emotion_adv=0.5)


def test_int8_logits_close(pair, rng):
    params, qparams = pair
    cond = _cond(rng)
    text = rng.integers(1, 50, (1, 10)).astype(np.int32)
    text[:, 0] = 5
    text[:, -1] = 0
    speech = rng.integers(0, 36, (1, 12)).astype(np.int32)
    _, fp = t3.forward(params, cond, jnp.asarray(text), jnp.asarray([10]),
                       jnp.asarray(speech), jnp.asarray([12]), TINY)
    _, q8 = t3.forward(qparams, cond, jnp.asarray(text), jnp.asarray([10]),
                       jnp.asarray(speech), jnp.asarray([12]), TINY)
    fp, q8 = np.asarray(fp, np.float64), np.asarray(q8, np.float64)
    cos = np.sum(fp * q8) / (np.linalg.norm(fp) * np.linalg.norm(q8))
    assert cos > 0.995, cos
    rel = np.linalg.norm(fp - q8) / np.linalg.norm(fp)
    assert rel < 0.1, rel


def test_int8_generation_well_formed(pair, rng):
    _, qparams = pair
    out = t3.generate(qparams, _cond(rng),
                      np.array([[5, 3, 7, 9, 2, 0]], np.int32),
                      max_new_tokens=16, cfg_weight=0.5, seed=1, cfg=TINY)
    out = np.asarray(out)
    assert out.size > 0
    body = out[out != TINY.stop_speech_token]
    assert (body < 36).all() and (body >= 0).all()


def test_decode_fence_raises_beyond_cap(pair, rng, monkeypatch):
    """The single-chip fused-batch limit is an asserted constraint, not a
    silent cap (v5e fault repro: scripts/repro_b64_decode_fault.py).
    The int8 KV cache halves the slabs and doubles the cap (round-4
    product probe: 32 utts / 64 rows clean and faster than sub-batching)."""
    params, _ = pair
    monkeypatch.delenv("CHATTERBOX_INT8_KV", raising=False)
    monkeypatch.delenv("CHATTERBOX_MAX_DECODE_UTT", raising=False)
    texts = np.tile(np.array([[5, 3, 7, 0]], np.int32),
                    (t3.MAX_DECODE_UTTERANCES + 1, 1))
    with pytest.raises(ValueError, match="max_decode_utterances"):
        t3.start_generation(params, _cond(rng), texts, cfg_weight=0.5,
                            max_new_tokens=8, cfg=TINY)
    # int8 KV doubles the cap: the same load prefills without the fence
    monkeypatch.setenv("CHATTERBOX_INT8_KV", "1")
    assert t3.max_decode_utterances() == 2 * t3.MAX_DECODE_UTTERANCES
    s, _ = t3.start_generation(params, _cond(rng), texts, cfg_weight=0.5,
                               max_new_tokens=8, cfg=TINY)
    assert s.done.shape[0] == t3.MAX_DECODE_UTTERANCES + 1
    monkeypatch.delenv("CHATTERBOX_INT8_KV")
    # generate_batch transparently sub-batches the same load
    outs = t3.generate_batch(params, _cond(rng), texts, max_new_tokens=4,
                             cfg_weight=0.5, seed=0, cfg=TINY)
    assert len(outs) == t3.MAX_DECODE_UTTERANCES + 1


def test_decode_fence_is_capacity_aware(monkeypatch):
    """The decode fence is KV BYTES, not a fixed row count: 64 CFG rows ran
    green at capacity 388 (1.53 GB int8) but crash the v5e worker at
    capacity 1132 (4.45 GB) — phased or not (q4ah + q5a, 6/6 tries). The
    derivation must keep every measured-green cell allowed, exclude the
    crash cell, and snap to powers of two so long-cap sub-batches reuse
    warm program shapes."""
    from chatterbox_embed_tpu.config import T3Config
    monkeypatch.delenv("CHATTERBOX_MAX_DECODE_UTT", raising=False)
    full = T3Config()  # 30L x 16H x 64d -> 61440 B/token-row int8

    monkeypatch.setenv("CHATTERBOX_INT8_KV", "1")
    assert t3.max_decode_utterances(388, cfg=full) == 32   # q4af green
    assert t3.max_decode_utterances(1132, cfg=full) == 16  # q4ag green,
    # ...which excludes the q4ah/q5a crash cell (32 utts at capacity 1132)
    assert t3.max_decode_utterances(2000, cfg=full) == 8   # snapped down
    # cfg-off single rows double the utterance budget
    assert (t3.max_decode_utterances(1132, rows_per_utt=1, cfg=full) == 32)

    # bf16 KV doubles the bytes: the same capacity halves the cap
    monkeypatch.setenv("CHATTERBOX_INT8_KV", "0")
    assert t3.max_decode_utterances(1132, cfg=full) == 8
    assert t3.max_decode_utterances(388, cfg=full) == 16   # base cap rules

    # env override wins absolutely (ops re-measurement escape hatch)
    monkeypatch.setenv("CHATTERBOX_MAX_DECODE_UTT", "64")
    assert t3.max_decode_utterances(5000, cfg=full) == 64


def test_generate_batch_subbatches_at_long_caps(pair, rng, monkeypatch):
    """generate_batch must split by the CAPACITY-aware fence: with the
    KV-bytes envelope shrunk so only 2 utterances fit at this capacity, a
    4-utterance batch decodes in sub-batches and returns per-row results
    identical to the unsplit run."""
    params, _ = pair
    monkeypatch.delenv("CHATTERBOX_MAX_DECODE_UTT", raising=False)
    cond = _cond(rng)
    texts = np.tile(np.array([[5, 3, 7, 0]], np.int32), (4, 1))
    kw = dict(max_new_tokens=8, cfg_weight=0.5, temperature=1e-4, seed=0,
              cfg=TINY)
    ref = t3.generate_batch(params, cond, texts, **kw)
    lcfg = TINY.llama
    per_tok = lcfg.num_layers * 2 * lcfg.num_kv_heads * lcfg.head_dim * 2
    cap = (t3._bucket(4) + t3.cond_width(cond, TINY) + 2
           + max(8, t3.DECODE_BLOCK))
    # envelope admits exactly 2 CFG utterances at this capacity
    monkeypatch.setattr(t3, "KV_FENCE_BYTES", 2 * 2 * cap * per_tok)
    assert t3.max_decode_utterances(cap, cfg=TINY) == 2
    outs = t3.generate_batch(params, cond, texts, **kw)
    assert len(outs) == 4
    for a, b in zip(outs, ref):
        # sub-batch seeds follow seed + s0 (the existing convention), so
        # rows 0/1 match bit-exactly; all rows must at least decode
        assert a.size > 0 and b.size > 0
    np.testing.assert_array_equal(outs[0], ref[0])
    np.testing.assert_array_equal(outs[1], ref[1])


def test_int8_teacher_forced_gate_metrics(pair, rng):
    """The promotion gate's metrics (scripts/int8_quality_gate.py): teacher-
    force a generated stream through both backbones and require high top-1
    next-token agreement and low KL — the listening-check proxy that
    isolates quantization error from sampling cascades."""
    params, qparams = pair
    cond = _cond(rng)
    text = np.concatenate([[5], rng.integers(1, 50, 8), [0]])[None].astype(np.int32)
    toks = t3.generate(params, cond, text, max_new_tokens=64, temperature=0.7,
                       cfg_weight=0.5, seed=0, cfg=TINY)
    toks = toks[toks < TINY.start_speech_token]
    assert toks.size >= 8
    speech = jnp.asarray(toks[None].astype(np.int32))
    slen = jnp.asarray([toks.size])
    tlen = jnp.asarray([text.shape[1]])
    _, la = t3.forward(params, cond, jnp.asarray(text), tlen, speech, slen, TINY)
    _, lb = t3.forward(qparams, cond, jnp.asarray(text), tlen, speech, slen, TINY)
    la = np.asarray(la, np.float64)[0, : toks.size]
    lb = np.asarray(lb, np.float64)[0, : toks.size]
    top1 = (la.argmax(-1) == lb.argmax(-1)).mean()
    assert top1 >= 0.9, top1
    pa = np.exp(la - la.max(-1, keepdims=True))
    pa /= pa.sum(-1, keepdims=True)
    logza = np.log(np.exp(la - la.max(-1, keepdims=True)).sum(-1)) + la.max(-1)
    logzb = np.log(np.exp(lb - lb.max(-1, keepdims=True)).sum(-1)) + lb.max(-1)
    kl = (pa * (la - lb)).sum(-1) - logza + logzb
    assert np.median(kl) < 5e-3, np.median(kl)


def test_int8_s3gen_mel_close(rng):
    """S3Gen int8 (VERDICT r3 #4): conformer + CFM-estimator linears
    quantized, full tokens->mel graph stays numerically faithful to fp —
    mel correlation and relative error bounded on the tiny config."""
    from chatterbox_embed_tpu.config import ChatterboxConfig
    from chatterbox_embed_tpu.models import s3gen as s3gen_mod
    from chatterbox_embed_tpu.utils.quantize import quantize_s3gen
    from chatterbox_embed_tpu.config import (S3GenConfig, S3TokenizerConfig,
                                             ConformerConfig, FlowDecoderConfig,
                                             HiFTConfig, replace)
    cfg = S3GenConfig(
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
    params = s3gen_mod.init(jax.random.PRNGKey(7), cfg)
    qparams = quantize_s3gen(params)
    tokens = jnp.asarray(rng.integers(0, 6561, (2, 20)), jnp.int32)
    token_len = jnp.asarray([8 + 20, 8 + 14])
    pt = jnp.asarray(rng.integers(0, 6561, (2, 8)), jnp.int32)
    pf = jnp.asarray(rng.standard_normal((2, 16, 8)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((2, 192)), jnp.float32)
    mel_fp = np.asarray(s3gen_mod.flow_to_mel(params, tokens, token_len, pt, pf,
                                              emb, finalize=True, cfg=cfg),
                        np.float64)
    mel_q8 = np.asarray(s3gen_mod.flow_to_mel(qparams, tokens, token_len, pt, pf,
                                              emb, finalize=True, cfg=cfg),
                        np.float64)
    assert mel_fp.shape == mel_q8.shape
    cos = np.sum(mel_fp * mel_q8) / (np.linalg.norm(mel_fp)
                                     * np.linalg.norm(mel_q8))
    assert cos > 0.99, cos
    rel = np.linalg.norm(mel_fp - mel_q8) / np.linalg.norm(mel_fp)
    assert rel < 0.15, rel


@pytest.mark.parametrize("mode", ["1", "2"])
def test_int8_kv_cache_decode(pair, rng, monkeypatch, mode):
    """int8 KV cache (CHATTERBOX_INT8_KV=1): batched XLA decode with
    quantized cache slabs must stay numerically faithful — prefill logits
    close to the fp-cache path, generation well-formed, flash/fused
    precedence respected (llama.KVCache docstring has the bandwidth case)."""
    params, _ = pair
    cond = _cond(rng)
    texts = rng.integers(1, 50, (4, 10)).astype(np.int32)
    texts[:, 0] = 5
    texts[:, -1] = 0
    kw = dict(cfg_weight=0.4, max_new_tokens=12, cfg=TINY)
    s_fp, _ = t3.start_generation(params, cond, texts, **kw)
    monkeypatch.setenv("CHATTERBOX_INT8_KV", mode)
    s_q, info = t3.start_generation(params, cond, texts, **kw)
    assert t3.LAST_GENERATION_INFO["kv_int8"] is True
    assert s_q.cache.k.dtype == jnp.int8 and s_q.cache.k_scale is not None
    la = np.asarray(s_fp.logits, np.float64)
    lb = np.asarray(s_q.logits, np.float64)
    cos = np.sum(la * lb) / (np.linalg.norm(la) * np.linalg.norm(lb))
    assert cos > 0.995, cos
    rel = np.linalg.norm(la - lb) / np.linalg.norm(la)
    assert rel < 0.1, rel
    # full decode runs and produces well-formed streams
    outs = t3.generate_batch(params, cond, texts, max_new_tokens=12,
                             cfg_weight=0.4, seed=3, cfg=TINY)
    assert len(outs) == 4
    for toks in outs:
        assert np.all((toks >= 0) & (toks < TINY.speech_tokens_dict_size))
    # token agreement with the fp-cache decode on the same seed: int8 KV
    # error is small, so most steps match (sampling cascades after the
    # first divergence make exact equality impossible to require)
    monkeypatch.delenv("CHATTERBOX_INT8_KV")
    outs_fp = t3.generate_batch(params, cond, texts, max_new_tokens=12,
                                cfg_weight=0.4, seed=3, cfg=TINY)
    first = [int(a[0] == b[0]) for a, b in zip(outs, outs_fp)
             if a.size and b.size]
    assert first and np.mean(first) >= 0.75, first
