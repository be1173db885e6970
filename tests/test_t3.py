"""T3 speech LM: conditioning, teacher-forced forward/loss, jitted generation."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from chatterbox_embed_tpu.config import T3Config, LlamaConfig, replace
from chatterbox_embed_tpu.models import t3
from chatterbox_embed_tpu.ops import sampling

TINY = T3Config(
    llama=LlamaConfig(hidden_size=64, intermediate_size=128, num_layers=2,
                      num_heads=4, num_kv_heads=4, head_dim=16),
    text_tokens_dict_size=50, speech_tokens_dict_size=40,
    start_speech_token=36, stop_speech_token=37,
    max_text_tokens=64, max_speech_tokens=128,
    speaker_embed_size=16, speech_cond_prompt_len=6,
)


@pytest.fixture(scope="module")
def tiny_t3():
    return t3.init(jax.random.PRNGKey(0), TINY)


def _cond(rng):
    return t3.T3Cond(
        speaker_emb=jnp.asarray(rng.standard_normal((1, 16)).astype(np.float32)),
        cond_prompt_speech_tokens=jnp.asarray(rng.integers(0, 36, (1, 6)).astype(np.int32)),
        emotion_adv=0.5,
    )


def test_cond_embeds_shape(tiny_t3, rng):
    ce = t3.cond_embeds(tiny_t3, _cond(rng), TINY)
    assert ce.shape == (1, 1 + 32 + 1, 64)


def test_forward_and_loss(tiny_t3, rng):
    text = jnp.asarray(rng.integers(0, 50, (2, 8)).astype(np.int32))
    speech = jnp.asarray(rng.integers(0, 36, (2, 12)).astype(np.int32))
    cond = t3.T3Cond(
        speaker_emb=jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32)),
        cond_prompt_speech_tokens=jnp.asarray(rng.integers(0, 36, (2, 6)).astype(np.int32)),
        emotion_adv=0.5)
    tl, sl = t3.loss(tiny_t3, cond, text, jnp.asarray([8, 5]), speech,
                     jnp.asarray([12, 9]), TINY)
    assert np.isfinite(float(tl)) and np.isfinite(float(sl))
    # CE against ~uniform vocab at init
    assert float(sl) < np.log(40) * 3


def test_generate_produces_tokens(tiny_t3, rng):
    text = np.concatenate([[5], rng.integers(1, 50, 6), [0]])[None]  # SOT..EOT
    toks = t3.generate(tiny_t3, _cond(rng), text, max_new_tokens=16,
                       temperature=0.8, cfg_weight=0.3, seed=1, cfg=TINY)
    assert 1 <= len(toks) <= 16
    valid = (toks < 36) | (toks == 37)
    assert valid.all()  # vocab mask: only real codes or EOS


def test_generate_deterministic_same_seed(tiny_t3, rng):
    text = np.concatenate([[5], rng.integers(1, 50, 6), [0]])[None]
    c = _cond(rng)
    t1 = t3.generate(tiny_t3, c, text, max_new_tokens=12, cfg_weight=0.3, seed=7, cfg=TINY)
    t2 = t3.generate(tiny_t3, c, text, max_new_tokens=12, cfg_weight=0.3, seed=7, cfg=TINY)
    np.testing.assert_array_equal(t1, t2)


def test_generate_bucket_invariance(tiny_t3, rng):
    """Two text lengths in the same bucket must not contaminate each other:
    the padded program must equal what an exact-length program computes."""
    c = _cond(rng)
    text = np.concatenate([[5], rng.integers(1, 50, 10), [0]])[None]
    t_pad = t3.generate(tiny_t3, c, text, max_new_tokens=8, cfg_weight=0.5, seed=3, cfg=TINY)
    # same text but exact bucket (len 48 would need padding; compare against
    # a monkeypatched exact bucket)
    import chatterbox_embed_tpu.models.t3 as t3mod
    orig = t3mod._TEXT_BUCKETS
    t3mod._TEXT_BUCKETS = (len(text[0]),)
    try:
        t_exact = t3.generate(tiny_t3, c, text, max_new_tokens=8, cfg_weight=0.5,
                              seed=3, cfg=TINY)
    finally:
        t3mod._TEXT_BUCKETS = orig
    np.testing.assert_array_equal(t_pad, t_exact)


def test_sampling_ops(rng):
    logits = jnp.asarray(rng.standard_normal(20).astype(np.float32))
    masked = sampling.vocab_mask_logits(logits, 10, 15)
    m = np.asarray(masked)
    assert np.isneginf(m[11]) and np.isfinite(m[15]) and np.isfinite(m[:10]).all()

    counts = jnp.zeros(20, jnp.int32).at[3].set(2)
    pen = np.asarray(sampling.repetition_penalty(logits, counts, 1.2))
    l3 = float(logits[3])
    assert np.isclose(pen[3], l3 / 1.2 if l3 > 0 else l3 * 1.2)

    mp = np.asarray(sampling.min_p_filter(logits, 0.5))
    probs = np.exp(np.asarray(logits)) / np.exp(np.asarray(logits)).sum()
    keep = probs >= 0.5 * probs.max()
    assert (np.isfinite(mp) == keep).all()


def test_top_p_matches_hf(rng):
    import torch
    from transformers.generation.logits_process import TopPLogitsWarper
    logits = rng.standard_normal((1, 50)).astype(np.float32)
    ours = np.asarray(sampling.top_p_filter(jnp.asarray(logits[0]), 0.7))
    ref = TopPLogitsWarper(top_p=0.7)(None, torch.from_numpy(logits))[0].numpy()
    np.testing.assert_array_equal(np.isfinite(ours), np.isfinite(ref))
    np.testing.assert_allclose(ours[np.isfinite(ours)], ref[np.isfinite(ref)], atol=1e-6)


def test_min_p_matches_hf(rng):
    import torch
    from transformers.generation.logits_process import MinPLogitsWarper
    logits = rng.standard_normal((1, 50)).astype(np.float32)
    ours = np.asarray(sampling.min_p_filter(jnp.asarray(logits[0]), 0.05))
    ref = MinPLogitsWarper(min_p=0.05)(None, torch.from_numpy(logits))[0].numpy()
    np.testing.assert_array_equal(np.isfinite(ours), np.isfinite(ref))


def test_generate_batch_of_one(tiny_t3, rng):
    """Regression: U=1 through generate_batch (stream squeezes the axis)."""
    from chatterbox_embed_tpu.models import t3 as t3m
    text = np.concatenate([[5], rng.integers(1, 50, 6), [0]])[None]
    out = t3m.generate_batch(tiny_t3, _cond(rng), text, max_new_tokens=8,
                             cfg_weight=0.3, seed=1, cfg=TINY)
    assert len(out) == 1 and out[0].ndim == 1 and 1 <= out[0].size <= 8


def test_per_row_sampling_params_match_scalar_rows(rng):
    """process_logits with per-row (U,1) params must equal stacking per-row
    scalar calls (deterministic — no sampling involved)."""
    u, v = 4, 40
    logits = jnp.asarray(rng.standard_normal((u, v)).astype(np.float32) * 3)
    counts = jnp.asarray(rng.integers(0, 3, (u, v)).astype(np.int32))
    temps = np.array([0.3, 0.8, 1.5, 4.0], np.float32)
    pens = np.array([1.0, 1.2, 1.5, 2.0], np.float32)
    minps = np.array([0.0, 0.05, 0.1, 0.2], np.float32)
    tops = np.array([0.5, 0.8, 0.95, 0.99], np.float32)
    vec = sampling.process_logits(
        logits, counts, valid_size=36, eos_id=37,
        temperature=temps.reshape(u, 1), repetition_penalty_val=pens.reshape(u, 1),
        min_p=minps.reshape(u, 1), top_p=tops.reshape(u, 1))
    for i in range(u):
        row = sampling.process_logits(
            logits[i:i + 1], counts[i:i + 1], valid_size=36, eos_id=37,
            temperature=float(temps[i]), repetition_penalty_val=float(pens[i]),
            min_p=float(minps[i]), top_p=float(tops[i]))
        np.testing.assert_array_equal(np.asarray(vec[i]), np.asarray(row[0]))


def test_generate_batch_per_row_params(tiny_t3, rng):
    """Per-row vectors thread through generate_batch: valid streams out, and
    a greedy-cold row is reproducible while a hot row uses its own params."""
    cond = _cond(rng)
    texts = rng.integers(1, 50, (3, 10)).astype(np.int32)
    texts[:, 0] = 5
    texts[:, -1] = 0
    kw = dict(max_new_tokens=12, seed=3, cfg=TINY)
    outs = t3.generate_batch(tiny_t3, cond, texts,
                             temperature=np.array([0.05, 0.8, 4.0]),
                             cfg_weight=np.array([0.4, 0.4, 0.0]),
                             repetition_penalty=np.array([1.0, 1.2, 1.5]),
                             min_p=np.array([0.0, 0.05, 0.0]),
                             top_p=np.array([1.0, 0.9, 1.0]), **kw)
    assert len(outs) == 3
    for seq in outs:
        assert seq.dtype == np.int32 and seq.ndim == 1 and seq.size >= 1
        assert np.all((seq < 36) | (seq == 37) | (seq == 36))
    # identical per-row settings must reproduce under the same seed
    again = t3.generate_batch(tiny_t3, cond, texts,
                              temperature=np.array([0.05, 0.8, 4.0]),
                              cfg_weight=np.array([0.4, 0.4, 0.0]),
                              repetition_penalty=np.array([1.0, 1.2, 1.5]),
                              min_p=np.array([0.0, 0.05, 0.0]),
                              top_p=np.array([1.0, 0.9, 1.0]), **kw)
    for a, b in zip(outs, again):
        np.testing.assert_array_equal(a, b)


def test_p_len_matches_context_for_all_cond_variants(tiny_t3, rng):
    """start_generation's analytic p_len must equal the real context width
    for every cond variant (prompt tokens present or None) — decode cache
    positions derive from it."""
    text = rng.integers(1, 50, (1, 10)).astype(np.int32)
    for cond in (_cond(rng),
                 t3.T3Cond(speaker_emb=jnp.zeros((1, 16)),
                           cond_prompt_speech_tokens=None, emotion_adv=0.5)):
        for cfg_on in (True, False):
            ctx = t3._build_context(tiny_t3, cond, jnp.asarray(text), TINY, cfg_on)
            analytic = t3.cond_width(cond, TINY) + 10 + 1 + (1 if cfg_on else 0)
            assert ctx.shape[1] == analytic
        # and the full generation path runs with this cond
        out = t3.generate(tiny_t3, cond, text, max_new_tokens=8, seed=0,
                          cfg_weight=0.4, cfg=TINY)
        assert out.size >= 1


def test_batched_flash_decode_matches_xla(tiny_t3, rng, monkeypatch):
    """The multi-row flash decode kernel (CHATTERBOX_PALLAS=1, interpreter on
    CPU) must reproduce the XLA decode path for a RAGGED batch: per-row text
    lengths ride the kernel as [lo, hi) key holes instead of forcing the XLA
    fallback (round-2 weak #3/#7). The product gate is 2 utterances since
    the round-4 A/B — raise it here so the 3-row kernel parity stays
    covered regardless of the shipped gate value."""
    monkeypatch.setattr(t3, "FLASH_DECODE_MAX_UTTERANCES", 8)
    lt = 12
    rows = np.zeros((3, lt), np.int32)
    lens = np.asarray([6, 9, 12], np.int32)
    for i, n in enumerate(lens):
        rows[i, :n] = rng.integers(1, 50, (n,)).astype(np.int32)
        rows[i, 0] = 5
    cond = _cond(rng)
    kw = dict(max_new_tokens=8, cfg_weight=0.5, temperature=0.7, seed=2,
              text_lens=lens, cfg=TINY)
    monkeypatch.setenv("CHATTERBOX_PALLAS", "0")
    xla = t3.generate_batch(tiny_t3, cond, rows, **kw)
    assert t3.LAST_GENERATION_INFO["use_flash"] is False
    monkeypatch.setenv("CHATTERBOX_PALLAS", "1")
    flash = t3.generate_batch(tiny_t3, cond, rows, **kw)
    assert t3.LAST_GENERATION_INFO["use_flash"] is True
    for a, b in zip(flash, xla):
        np.testing.assert_array_equal(a, b)


def test_phased_cache_matches_unphased(tiny_t3, rng, monkeypatch):
    """CHATTERBOX_PHASED_CACHE=K (batched XLA decode through K programs
    whose attention statically slices successively longer prefixes of ONE
    full-capacity cache) must produce the identical token stream to the
    single-capacity decode: slots beyond the live prefix are never
    attended, so the phase boundary is invisible to the numerics. Covers
    ragged rows (key_valid slicing per phase) and K that does not divide
    the step count."""
    lt = 12
    rows = np.zeros((3, lt), np.int32)
    lens = np.asarray([6, 9, 12], np.int32)
    for i, n in enumerate(lens):
        rows[i, :n] = rng.integers(1, 50, (n,)).astype(np.int32)
        rows[i, 0] = 5
    cond = _cond(rng)
    kw = dict(max_new_tokens=70, cfg_weight=0.5, temperature=0.7, seed=4,
              text_lens=lens, cfg=TINY)
    monkeypatch.delenv("CHATTERBOX_PHASED_CACHE", raising=False)
    base = t3.generate_batch(tiny_t3, cond, rows, **kw)
    assert len(t3.LAST_GENERATION_INFO["phase_totals"]) == 1
    for k_ph in (2, 3):
        monkeypatch.setenv("CHATTERBOX_PHASED_CACHE", str(k_ph))
        phased = t3.generate_batch(tiny_t3, cond, rows, **kw)
        totals = t3.LAST_GENERATION_INFO["phase_totals"]
        assert len(totals) >= 2 and totals[-1] > totals[0]
        for a, b in zip(phased, base):
            np.testing.assert_array_equal(a, b)


def test_phased_cache_matches_unphased_int8_kv(tiny_t3, rng, monkeypatch):
    """Phased prefix reads must slice the int8 KV slabs AND their per-slot
    scale planes coherently."""
    rows = np.stack([np.r_[5, rng.integers(1, 50, 9)].astype(np.int32)] * 2)
    cond = _cond(rng)
    kw = dict(max_new_tokens=40, cfg_weight=0.5, temperature=0.7, seed=5,
              cfg=TINY)
    monkeypatch.setenv("CHATTERBOX_INT8_KV", "1")
    monkeypatch.delenv("CHATTERBOX_PHASED_CACHE", raising=False)
    base = t3.generate_batch(tiny_t3, cond, rows, **kw)
    assert t3.LAST_GENERATION_INFO["kv_int8"] is True
    monkeypatch.setenv("CHATTERBOX_PHASED_CACHE", "2")
    phased = t3.generate_batch(tiny_t3, cond, rows, **kw)
    assert len(t3.LAST_GENERATION_INFO["phase_totals"]) >= 2
    for a, b in zip(phased, base):
        np.testing.assert_array_equal(a, b)


def test_phased_cache_default_derivation(monkeypatch):
    """Phased cache is DERIVED from the generation capacity (q4ag: K=4 =
    ~256-token phases at the 1000-token product cap is -28.4% t3/step,
    K=2 -19.5%; q4s: 250-token caps stay single-capacity): unset env ->
    K = ceil(cap/256) at caps >= 600, single-capacity below; the env
    always wins (0/1 = off everywhere, K >= 2 forced, junk = off)."""
    monkeypatch.delenv("CHATTERBOX_PHASED_CACHE", raising=False)
    assert t3._phased_cache_k(1000) == 4
    assert t3._phased_cache_k(768) == 3
    assert t3._phased_cache_k(600) == 3
    assert t3._phased_cache_k(599) == 0
    assert t3._phased_cache_k(250) == 0
    assert t3._phased_cache_k() == 0
    monkeypatch.setenv("CHATTERBOX_PHASED_CACHE", "0")
    assert t3._phased_cache_k(1000) == 0
    monkeypatch.setenv("CHATTERBOX_PHASED_CACHE", "1")
    assert t3._phased_cache_k(1000) == 1   # < 2 disables at the call site
    monkeypatch.setenv("CHATTERBOX_PHASED_CACHE", "4")
    assert t3._phased_cache_k(100) == 4
    # a typo'd env var must NOT silently disable the derived win: it warns
    # once and falls back to the derivation (round-4 advisor finding)
    monkeypatch.setenv("CHATTERBOX_PHASED_CACHE", "junk")
    t3._phased_env_warned = False
    with pytest.warns(UserWarning, match="CHATTERBOX_PHASED_CACHE"):
        assert t3._phased_cache_k(1000) == 4
    assert t3._phased_cache_k(1000) == 4   # warning is one-time
    monkeypatch.setenv("CHATTERBOX_PHASED_CACHE", "")
    assert t3._phased_cache_k(1000) == 4   # empty = unset (derive)


def test_phased_cache_derived_engages_and_matches(tiny_t3, rng, monkeypatch):
    """With the env unset, a long-cap batched decode derives ~256-token
    phases (ceil(640/256) = 3) and stays bit-identical to the forced
    single-capacity decode."""
    rows = np.stack([np.r_[5, rng.integers(1, 50, 9)].astype(np.int32)] * 2)
    cond = _cond(rng)
    kw = dict(max_new_tokens=640, cfg_weight=0.5, temperature=0.7, seed=6,
              cfg=TINY)
    monkeypatch.delenv("CHATTERBOX_PHASED_CACHE", raising=False)
    derived = t3.generate_batch(tiny_t3, cond, rows, **kw)
    assert len(t3.LAST_GENERATION_INFO["phase_totals"]) == 3
    monkeypatch.setenv("CHATTERBOX_PHASED_CACHE", "0")
    base = t3.generate_batch(tiny_t3, cond, rows, **kw)
    assert len(t3.LAST_GENERATION_INFO["phase_totals"]) == 1
    for a, b in zip(derived, base):
        np.testing.assert_array_equal(a, b)


def test_one_compiled_program_per_bucket(tiny_t3, rng):
    """Different text lengths in one bucket must reuse the SAME compiled
    prefill and decode programs (pad is a traced operand, not a static) —
    the serving property that keeps novel text lengths from paying a fresh
    XLA compile."""
    cond = _cond(rng)
    t3._context_prefill.clear_cache()
    t3.decode_block.clear_cache()
    for lt in (9, 11, 14):   # all inside the 48-bucket (the smallest)
        text = rng.integers(1, 50, (1, lt)).astype(np.int32)
        text[:, 0] = 5
        out = t3.generate(tiny_t3, cond, text, max_new_tokens=8, seed=0,
                          cfg_weight=0.4, cfg=TINY)
        assert out.size >= 1
    assert t3._context_prefill._cache_size() == 1
    assert t3.decode_block._cache_size() == 1


def test_multivoice_batched_prefill_matches_solo(tiny_t3, rng):
    """Multi-voice lock-step batching: a T3Cond carrying (U, ...) per-row
    speaker embeddings / prompt tokens / emotion must give each row the SAME
    prefill logits as that voice's solo start_generation (teacher-forced
    determinism isolates the conditioning path from sampling cascades)."""
    # equal text lengths: solo-vs-batch comparability needs the BOS at the
    # same context column (ragged rows shift it; that path is covered by the
    # key_valid cache tests) — this test isolates the per-row CONDITIONING
    texts = np.full((2, 10), 0, np.int32)
    texts[:, 0] = 5
    texts[:, 1:9] = rng.integers(1, 50, (2, 8))
    text_lens = np.asarray([10, 10], np.int32)
    conds = [t3.T3Cond(
        speaker_emb=jnp.asarray(rng.standard_normal((1, 16)).astype(np.float32)),
        cond_prompt_speech_tokens=jnp.asarray(
            rng.integers(0, 36, (1, 6)).astype(np.int32)),
        emotion_adv=float(e)) for e in (0.3, 0.8)]
    kw = dict(cfg_weight=0.4, max_new_tokens=12, cfg=TINY)
    solo = []
    for i, c in enumerate(conds):
        s, _ = t3.start_generation(tiny_t3, c, texts[i: i + 1], **kw)
        solo.append(np.asarray(s.logits, np.float64))
    stacked = t3.T3Cond(
        speaker_emb=jnp.concatenate([c.speaker_emb for c in conds]),
        cond_prompt_speech_tokens=jnp.concatenate(
            [c.cond_prompt_speech_tokens for c in conds]),
        emotion_adv=jnp.asarray([0.3, 0.8], jnp.float32))
    s_b, _ = t3.start_generation(tiny_t3, stacked, texts, text_lens=text_lens,
                                 **kw)
    lb = np.asarray(s_b.logits, np.float64)          # rows [cond0..1; unc0..1]
    for i in range(2):
        # same text bucket => bit-comparable modulo bf16-free CPU math
        np.testing.assert_allclose(lb[i], solo[i][0], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(lb[2 + i], solo[i][1], rtol=1e-4, atol=1e-4)


def test_multivoice_generate_batch_runs(tiny_t3, rng):
    texts = np.full((2, 9), 0, np.int32)
    texts[:, 0] = 5
    texts[:, 1:8] = rng.integers(1, 50, (2, 7))
    stacked = t3.T3Cond(
        speaker_emb=jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32)),
        cond_prompt_speech_tokens=jnp.asarray(
            rng.integers(0, 36, (2, 6)).astype(np.int32)),
        emotion_adv=jnp.asarray([0.4, 0.6], jnp.float32))
    outs = t3.generate_batch(tiny_t3, stacked, texts, max_new_tokens=10,
                             cfg_weight=0.4, seed=5, cfg=TINY)
    assert len(outs) == 2
    for toks in outs:
        assert np.all((toks >= 0) & (toks < TINY.speech_tokens_dict_size))
