"""Numerical fidelity of the windowed streaming path (VERDICT r2 #1/#2).

Covers:
- the fused first-chunk program IS the program behind stream_generate's
  first yield (one-dispatch property through the public API);
- fused vs unfused (kill-switch) stream equivalence, chunk by chunk;
- a single full-coverage window equals the one-shot flow exactly;
- the mu_tail pin slice arithmetic (an off-by-one in tail_start fails);
- seam invariants across every window join: mel context frames are exactly
  the previously-emitted frames, and the vocoder phase carry equals the
  recomputed cumulative phase at the handoff sample (an off-by-one in
  carry_idx or the mel_tail bookkeeping fails).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from chatterbox_embed_tpu.config import (ChatterboxConfig, T3Config, LlamaConfig,
                                         S3GenConfig, S3TokenizerConfig,
                                         ConformerConfig, FlowDecoderConfig,
                                         HiFTConfig, replace)
from chatterbox_embed_tpu.models import s3gen as s3gen_mod
from chatterbox_embed_tpu.models import conformer as conformer_mod
from chatterbox_embed_tpu.models import hifigan as hift_mod
from chatterbox_embed_tpu.models import layers as L

TINY = ChatterboxConfig(
    t3=T3Config(
        llama=LlamaConfig(hidden_size=64, intermediate_size=128, num_layers=2,
                          num_heads=4, num_kv_heads=4, head_dim=16),
        max_text_tokens=64, max_speech_tokens=128, speech_cond_prompt_len=8),
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
        mel_num=8,
    ),
)


@pytest.fixture(scope="module")
def s3(rng_mod):
    return s3gen_mod.init(jax.random.PRNGKey(7), TINY.s3gen)


@pytest.fixture(scope="module")
def rng_mod():
    return np.random.default_rng(0)


@pytest.fixture(scope="module")
def ref(rng_mod):
    """Prompt bundle shaped like a prepared voice."""
    return dict(
        prompt_tokens=jnp.asarray(rng_mod.integers(0, 6561, (1, 8)), jnp.int32),
        prompt_feat=jnp.asarray(rng_mod.standard_normal((1, 16, 8)), jnp.float32),
        embedding=jnp.asarray(rng_mod.standard_normal((1, 192)), jnp.float32))


@pytest.fixture(scope="module")
def tts():
    from chatterbox_embed_tpu.tts import ChatterboxTTS
    import chatterbox_embed_tpu.models.t3 as t3mod
    import chatterbox_embed_tpu.tts as ttsmod
    t3mod._TEXT_BUCKETS = (24, 48)
    ttsmod._TOKEN_BUCKETS = (32, 64, 128)
    tts = ChatterboxTTS.from_random(seed=0, config=TINY)
    # prepared conditionals from a synthetic reference
    import tempfile
    from chatterbox_embed_tpu.stitching.stitcher import write_wav
    t = np.arange(24_000) / 24_000
    wav = (0.3 * np.sin(2 * np.pi * 150 * t)).astype(np.float32)
    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        write_wav(f.name, wav, 24_000)
        tts.prepare_conditionals_with_audio_prompt(f.name, exaggeration=0.5)
    return tts


def test_single_window_equals_oneshot(s3, ref, rng_mod):
    """A window covering the whole utterance (pin 0, noise_off 0,
    finalize=True) must equal the one-shot flow: same conformer pass, same
    absolute-position noise, same ODE — this pins the window arithmetic
    (mask widths, prompt handling, noise indexing) to the one-shot truth."""
    n = 20
    tokens = jnp.asarray(rng_mod.integers(0, 6561, (1, n)), jnp.int32)
    token_len = jnp.asarray([8 + n])
    one = s3gen_mod.flow_to_mel(s3, tokens, token_len, ref["prompt_tokens"],
                                ref["prompt_feat"], ref["embedding"],
                                finalize=True, cfg=TINY.s3gen)
    pin = 2 * (6 - 3)
    win, _mu = s3gen_mod.flow_to_mel_window(
        s3, tokens, jnp.asarray([n]), ref["prompt_tokens"], ref["prompt_feat"],
        ref["embedding"], jnp.zeros((1, pin, 8), jnp.float32),
        pin_frames=0, noise_off=0, finalize=True, cfg=TINY.s3gen)
    np.testing.assert_allclose(np.asarray(win), np.asarray(one),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_mu_tail_slice_arithmetic(s3, ref, rng_mod):
    """mu_tail must be EXACTLY mu[tail_start : tail_start+pin] with
    tail_start = prompt_mel + r*(vlen - C): the frames the next window pins
    over its context region. Recomputed white-box; an off-by-one in
    s3gen.tail_start fails."""
    cfg = TINY.s3gen
    r = cfg.flow.token_mel_ratio
    look = cfg.flow.pre_lookahead_len
    C = 6
    pin = r * (C - look)
    n = 14
    tokens = jnp.asarray(rng_mod.integers(0, 6561, (1, n)), jnp.int32)
    mu_pin0 = jnp.zeros((1, pin, 8), jnp.float32)
    _mel, mu_tail = s3gen_mod.flow_to_mel_window(
        s3, tokens, jnp.asarray([n]), ref["prompt_tokens"], ref["prompt_feat"],
        ref["embedding"], mu_pin0, pin_frames=0, noise_off=0,
        finalize=False, cfg=cfg)

    # recompute mu exactly as the window impl does (embed -> conformer ->
    # proj); pin_frames=0 so no pin overwrite
    fl = s3["flow"]
    full = jnp.concatenate([ref["prompt_tokens"], tokens], axis=1)
    token_len = jnp.asarray([8 + n])
    mask = (jnp.arange(full.shape[1])[None] < token_len[:, None])
    x = L.embedding(fl["input_embedding"], jnp.clip(full, 0, None))
    x = x * mask[..., None].astype(x.dtype)
    h = conformer_mod.forward(fl["encoder"], x, token_len, cfg.flow.encoder,
                              jnp.float32)
    mu = L.linear(fl["encoder_proj"], h.astype(jnp.float32))
    mel_len1 = ref["prompt_feat"].shape[1]
    tail_start = mel_len1 + r * n - pin - r * look   # == mel_len1 + r*(n - C)
    expected = np.asarray(mu[:, tail_start: tail_start + pin])
    np.testing.assert_allclose(np.asarray(mu_tail), expected,
                               rtol=2e-4, atol=2e-5)


def _collect_stream(tts, monkeypatch_ctx, **kw):
    """Run stream_generate recording every flow + vocoder window call."""
    import chatterbox_embed_tpu.models.s3gen as s3g
    flows, vocs = [], []
    orig_flow = s3g.flow_to_mel_window
    orig_voc = hift_mod.stream_synthesize

    def flow_spy(params, tokens, vlen, pt, pf, emb, mu_pin, pin_frames,
                 noise_off, finalize=False, **k):
        out = orig_flow(params, tokens, vlen, pt, pf, emb, mu_pin, pin_frames,
                        noise_off, finalize=finalize, **k)
        flows.append(dict(tokens=np.asarray(tokens).copy(),
                          vlen=int(np.asarray(vlen)[0]),
                          mu_pin=np.asarray(mu_pin).copy(),
                          pin_frames=int(np.asarray(pin_frames)),
                          noise_off=int(np.asarray(noise_off)),
                          finalize=bool(finalize),
                          mu_tail=np.asarray(out[1]).copy()))
        return out

    def voc_spy(params, mel_win, phase_key, noise_key, phase_carry, carry_idx,
                **k):
        out = orig_voc(params, mel_win, phase_key, noise_key, phase_carry,
                       carry_idx, **k)
        vocs.append(dict(mel_win=np.asarray(mel_win).copy(),
                         phase_in=np.asarray(phase_carry).copy(),
                         carry_idx=int(np.asarray(carry_idx)),
                         carry_out=np.asarray(out[1]).copy()))
        return out

    monkeypatch_ctx.setattr(s3g, "flow_to_mel_window", flow_spy)
    monkeypatch_ctx.setattr(hift_mod, "stream_synthesize", voc_spy)
    chunks = list(tts.stream_generate(**kw))
    return chunks, flows, vocs


@pytest.mark.slow
def test_stream_seam_invariants(tts, monkeypatch):
    """Every window join must be seamless by construction:
    - the mu pin chain: window k's mu_pin IS window k-1's mu_tail;
    - CFM noise offsets advance by exactly the emitted token count;
    - the vocoder context frames equal the previous window's emitted tail
      (an off-by-one in the mel_tail bookkeeping fails);
    - the phase carry equals the recomputed cumulative phase at carry_idx
      (an off-by-one in carry_idx fails)."""
    monkeypatch.setenv("CHATTERBOX_FUSED_FIRST_CHUNK", "0")
    G = 8                                     # constant group size
    cfg = tts.cfg.s3gen
    r = cfg.flow.token_mel_ratio
    look = cfg.flow.pre_lookahead_len
    C = tts.STREAM_CTX_TOKENS
    M = tts.STREAM_VOC_CTX_MEL
    up = cfg.hift.total_upsample
    new_cap = r * (G + look)

    chunks, flows, vocs = _collect_stream(
        tts, monkeypatch, text="A sentence long enough to span many windows.",
        block_tokens=G, throughput_block_tokens=G, max_new_tokens=48,
        cfg_weight=0.3, seed=11)
    assert len(vocs) >= 3, "need several windows to test seams"
    assert len(chunks) == len(vocs)

    # ---- flow chain
    n_tok = 0
    for k, f in enumerate(flows):
        ctx_len = 0 if k == 0 else min(C, n_tok)
        assert f["pin_frames"] == (0 if k == 0 else r * (C - look))
        assert f["noise_off"] == r * (n_tok - ctx_len)
        # the window's leading context tokens are the previous tail tokens
        if k:
            assert f["vlen"] >= ctx_len
            np.testing.assert_array_equal(
                f["tokens"][0, :ctx_len], prev_tokens[-ctx_len:])
            # mu pin chain: this window pins the previous window's mu_tail
            np.testing.assert_array_equal(f["mu_pin"], flows[k - 1]["mu_tail"])
        prev_tokens = f["tokens"][0, :f["vlen"]]
        n_tok += f["vlen"] - ctx_len

    # ---- vocoder chain
    for k, v in enumerate(vocs):
        m_eff = v["mel_win"].shape[1] - new_cap
        assert 0 <= m_eff <= M
        valid_new = chunks[k].size // up
        if k:
            prev = vocs[k - 1]
            m_prev = prev["mel_win"].shape[1] - new_cap
            valid_prev = chunks[k - 1].size // up
            valid_end = m_prev + valid_prev
            # context mel == previous window's last emitted frames, exactly
            np.testing.assert_array_equal(
                v["mel_win"][:, :m_eff],
                prev["mel_win"][:, valid_end - m_eff: valid_end])
            # carry_idx points at the sample just before this window's start
            assert prev["carry_idx"] == max((valid_end - m_eff) * up - 1, 0)
            # phase carry == recomputed cumulative phase at that sample
            f0 = hift_mod.f0_predict(tts.s3gen_params["hift"]["f0_predictor"],
                                     jnp.asarray(prev["mel_win"]))
            f0_up = jnp.repeat(f0, up, axis=-1)
            nh = cfg.hift.nb_harmonics + 1
            harm = jnp.arange(1, nh + 1, dtype=jnp.float32)[None, :, None]
            f_mat = f0_up[:, None, :] * harm / cfg.hift.sampling_rate
            rad = jnp.asarray(prev["phase_in"])[:, :, None] + jnp.cumsum(f_mat, axis=-1)
            expected = np.asarray(rad[:, :, prev["carry_idx"]] % 1.0)
            np.testing.assert_allclose(v["phase_in"], expected,
                                       rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_stream_first_chunk_single_dispatch(tts, monkeypatch):
    """stream_generate's FIRST yielded chunk must come from the fused
    one-dispatch program: none of the separate prefill / decode / flow /
    vocoder programs may run before the first yield (VERDICT r2 weak #1)."""
    import chatterbox_embed_tpu.models.s3gen as s3g
    import chatterbox_embed_tpu.models.t3 as t3m
    calls = []
    for mod, name in ((t3m, "_context_prefill"), (t3m, "decode_block"),
                      (s3g, "flow_to_mel_window"),
                      (hift_mod, "stream_synthesize")):
        orig = getattr(mod, name)
        def spy(*a, __orig=orig, __name=name, **k):
            calls.append(__name)
            return __orig(*a, **k)
        # the fused program composes the jitted fns' underlying impls via
        # .__wrapped__ at trace time — that access must NOT count as a call
        spy.__wrapped__ = getattr(orig, "__wrapped__", orig)
        monkeypatch.setattr(mod, name, spy)

    it = tts.stream_generate("Hello streaming world, fused this time.",
                             block_tokens=8, max_new_tokens=32,
                             cfg_weight=0.3, seed=5)
    first = next(it)
    assert first.size > 0 and np.isfinite(first).all()
    assert calls == [], f"separate programs ran before first yield: {calls}"
    from chatterbox_embed_tpu.models.t3 import LAST_GENERATION_INFO
    assert LAST_GENERATION_INFO.get("fused_first_chunk") is True
    # the stream continues from the fused state through the normal windowed
    # loop (decode_block + flow + vocoder now engage)
    rest = list(it)
    assert "decode_block" in calls
    total = np.concatenate([first] + rest)
    assert np.isfinite(total).all() and total.size % 480 == 0


@pytest.mark.slow
def test_stream_fused_degenerate_equals_unfused(tts, monkeypatch):
    """Degenerate short utterance: when the decode ends within the first
    `look` (pre-lookahead) tokens, the fused first-chunk program emits NO
    audio (n_valid_mel == 0). The loop must then fall back to the unfused
    first-window path exactly — fade-in applied, noise index 0, initial
    phase — instead of seeding a context window (ADVICE r3 finding).
    max_new_tokens=2 < look=3 forces the case deterministically."""
    kw = dict(text="Hi.", block_tokens=8, throughput_block_tokens=8,
              max_new_tokens=2, cfg_weight=0.3, seed=9)
    monkeypatch.setenv("CHATTERBOX_FUSED_FIRST_CHUNK", "0")
    plain = list(tts.stream_generate(**kw))
    monkeypatch.setenv("CHATTERBOX_FUSED_FIRST_CHUNK", "1")
    fused = list(tts.stream_generate(**kw))
    assert len(fused) == len(plain) == 1
    assert fused[0].shape == plain[0].shape and fused[0].size > 0
    np.testing.assert_allclose(fused[0], plain[0], rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_stream_fused_equals_unfused(tts, monkeypatch):
    """The fused first chunk must be numerically equivalent to the unfused
    loop: same tokens, same windows, same noise draws — chunk for chunk."""
    kw = dict(text="The fused and unfused paths must agree exactly.",
              block_tokens=8, throughput_block_tokens=8, max_new_tokens=32,
              cfg_weight=0.3, seed=9)
    monkeypatch.setenv("CHATTERBOX_FUSED_FIRST_CHUNK", "0")
    plain = list(tts.stream_generate(**kw))
    monkeypatch.setenv("CHATTERBOX_FUSED_FIRST_CHUNK", "1")
    fused = list(tts.stream_generate(**kw))
    assert len(fused) == len(plain) and len(fused) >= 2
    for a, b in zip(fused, plain):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_windowed_synth_block_split_invariance(s3, ref):
    """The WindowedSynth docstring's core claim, pinned directly: identical
    token feeds produce IDENTICAL audio regardless of how the tokens were
    batched into feed() calls — the doubling schedule groups by its own
    targets, so [6,6,6,6,...] blocks and one [all] block must emit
    bit-equal chunk streams (this is what lets the continuous engine's
    block boundaries differ from the lock-step stream's without changing
    the audio)."""
    from chatterbox_embed_tpu.streaming import WindowedSynth
    rng = np.random.default_rng(11)
    toks = rng.integers(0, 6561, (40,)).astype(np.int32)

    def run(splits):
        synth = WindowedSynth(
            s3, ref["prompt_tokens"], ref["prompt_feat"], ref["embedding"],
            phase_key=jax.random.PRNGKey(3), cfg=TINY, block_tokens=6,
            throughput_block_tokens=24)
        chunks = []
        i = 0
        for n in splits:
            chunks.extend(synth.feed(toks[i:i + n]))
            i += n
        chunks.extend(synth.finish())
        return np.concatenate(chunks)

    a = run([6] * 6 + [4])          # engine-block-sized feeds
    b = run([40])                   # one bulk feed
    c = run([1] * 40)               # token-at-a-time
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, c)
