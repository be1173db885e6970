"""Continuous-batching engine (models/t3_engine.py): per-row cache positions,
slot refill, request isolation, near-greedy cross-validation vs t3.generate."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from chatterbox_embed_tpu.config import T3Config, LlamaConfig
from chatterbox_embed_tpu.models import llama, t3, t3_engine

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
        cond_prompt_speech_tokens=jnp.asarray(
            rng.integers(0, 36, (1, 6)).astype(np.int32)),
        emotion_adv=0.5,
    )


def _text(rng, n=6):
    return np.concatenate([[5], rng.integers(1, 50, n), [0]])[None].astype(np.int32)


def test_per_row_cache_pos_matches_scalar(tiny_t3, rng):
    """llama.forward with a per-row cache_pos vector of one shared value is
    bit-identical to the scalar-cache_pos decode step (insert + attention)."""
    cfg = TINY.llama
    b, total, pos = 4, 24, 7
    cache = llama.init_cache(cfg, b, total, jnp.float32)
    # fill a few history columns so attention is non-trivial
    k0 = jnp.asarray(rng.standard_normal(
        (cfg.num_layers, pos, b, cfg.num_kv_heads, cfg.head_dim)).astype(np.float32))
    v0 = jnp.asarray(rng.standard_normal(k0.shape).astype(np.float32))
    cache = llama.KVCache(cache.k.at[:, :pos].set(k0),
                          cache.v.at[:, :pos].set(v0))
    x = jnp.asarray(rng.standard_normal((b, 1, cfg.hidden_size)).astype(np.float32))
    pos_id = jnp.full((b, 1), pos, jnp.int32)
    mask = (jnp.arange(total)[None, None, :] <= pos)
    mask = jnp.broadcast_to(mask, (b, 1, total))
    h_s, c_s = llama.forward(tiny_t3["llama"], x, pos_id, mask, cache=cache,
                             cache_pos=pos, cfg=cfg)
    h_v, c_v = llama.forward(tiny_t3["llama"], x, pos_id, mask, cache=cache,
                             cache_pos=jnp.full((b,), pos, jnp.int32), cfg=cfg)
    np.testing.assert_array_equal(np.asarray(h_s), np.asarray(h_v))
    np.testing.assert_array_equal(np.asarray(c_s.k), np.asarray(c_v.k))
    np.testing.assert_array_equal(np.asarray(c_s.v), np.asarray(c_v.v))


def test_per_row_cache_pos_distinct_columns(tiny_t3, rng):
    """Distinct per-row positions write each row's k/v into its own column
    and leave every other (column, row) untouched."""
    cfg = TINY.llama
    b, total = 3, 16
    cache = llama.init_cache(cfg, b, total, jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, 1, cfg.hidden_size)).astype(np.float32))
    pos = jnp.asarray([2, 9, 5], jnp.int32)
    mask = (jnp.arange(total)[None, :] <= pos[:, None])[:, None, :]
    _, c = llama.forward(tiny_t3["llama"], x, pos[:, None], mask, cache=cache,
                         cache_pos=pos, cfg=cfg)
    k = np.asarray(c.k)
    written = np.abs(k).sum(axis=(0, 3, 4))          # (total, B)
    for row, p in enumerate([2, 9, 5]):
        assert written[p, row] > 0
        other = np.delete(written[:, row], p)
        np.testing.assert_array_equal(other, 0)


def _drain_one(params, cond, text, *, seed, slots=1, bucket=16, max_new=16,
               block=8, kv_int8=False, temperature=0.8, cfg_weight=0.5,
               **kw):
    eng = t3_engine.ContinuousDecoder(
        params, TINY, slots=slots, text_bucket=bucket, max_new_tokens=max_new,
        block=block, kv_int8=kv_int8)
    rid = eng.submit(text, cond, seed=seed, temperature=temperature,
                     cfg_weight=cfg_weight, **kw)
    return eng.drain()[rid]


def test_engine_near_greedy_matches_generate(tiny_t3, rng):
    """Near-greedy (temperature -> 0) removes the RNG-scheme difference:
    the engine's per-row masks/positions/inserts must then reproduce
    t3.generate token-for-token — cross-validating the whole per-row
    arithmetic against the proven lock-step decode path."""
    cond = _cond(rng)
    text = _text(rng)
    ref = t3.generate(tiny_t3, cond, text, max_new_tokens=16,
                      temperature=1e-4, cfg_weight=0.5, seed=3, cfg=TINY)
    got = _drain_one(tiny_t3, cond, text, seed=11, temperature=1e-4)
    np.testing.assert_array_equal(np.asarray(ref), got)


def test_engine_isolation_under_traffic(tiny_t3, rng):
    """THE continuous-batching contract: a request decodes the same tokens
    no matter which slot it lands in or what traffic surrounds it (here:
    3 requests through 2 slots force a mid-flight refill)."""
    conds = [_cond(rng) for _ in range(3)]
    texts = [_text(rng, n) for n in (4, 6, 8)]
    seeds = [7, 8, 9]
    temps = [0.8, 1.2, 0.6]

    eng = t3_engine.ContinuousDecoder(tiny_t3, TINY, slots=2, text_bucket=16,
                                      max_new_tokens=16, block=4)
    rids = [eng.submit(t, c, seed=s, temperature=tp)
            for t, c, s, tp in zip(texts, conds, seeds, temps)]
    results = eng.drain()
    assert eng.blocks_run > 1            # the refill actually interleaved

    for rid, t, c, s, tp in zip(rids, texts, conds, seeds, temps):
        solo = _drain_one(tiny_t3, c, t, seed=s, temperature=tp)
        np.testing.assert_array_equal(results[rid], solo)


def test_engine_ring_wraparound_isolation(tiny_t3, rng):
    """Requests entering after the ring has wrapped several times decode the
    same tokens as in a fresh engine: ring columns are written-at-step (ws)
    gated, so stale content from earlier occupants/wraps never leaks into a
    later occupant's attention window."""
    texts = [_text(rng, 4) for _ in range(5)]
    conds = [_cond(rng) for _ in range(5)]
    eng = t3_engine.ContinuousDecoder(tiny_t3, TINY, slots=1, text_bucket=16,
                                      max_new_tokens=6, block=3)
    rids = [eng.submit(t, c, seed=40 + i, max_new_tokens=6)
            for i, (t, c) in enumerate(zip(texts, conds))]
    results = eng.drain()
    assert int(np.asarray(eng.state.g)) > 12   # the R=6 ring wrapped twice+
    for i, (rid, t, c) in enumerate(zip(rids, texts, conds)):
        solo = _drain_one(tiny_t3, c, t, seed=40 + i, max_new=6, block=3,
                          max_new_tokens=6)
        np.testing.assert_array_equal(results[rid], solo)


def test_engine_int8_kv_isolation(tiny_t3, rng):
    """The int8 KV cache path (per-row scatter of slabs AND scales) keeps
    the isolation contract bit-exactly."""
    conds = [_cond(rng) for _ in range(3)]
    texts = [_text(rng, n) for n in (5, 7, 6)]
    eng = t3_engine.ContinuousDecoder(tiny_t3, TINY, slots=2, text_bucket=16,
                                      max_new_tokens=12, block=4, kv_int8=True)
    rids = [eng.submit(t, c, seed=20 + i)
            for i, (t, c) in enumerate(zip(texts, conds))]
    results = eng.drain()
    for i, (rid, t, c) in enumerate(zip(rids, texts, conds)):
        solo = _drain_one(tiny_t3, c, t, seed=20 + i, kv_int8=True,
                          max_new=12, block=4)
        np.testing.assert_array_equal(results[rid], solo)


def test_engine_limit_and_eos_trim(tiny_t3, rng):
    """A request capped by max_new_tokens returns exactly `limit` ids with
    no artificial fill-EOS appended; EOS-terminated requests include EOS."""
    cond = _cond(rng)
    text = _text(rng)
    out = _drain_one(tiny_t3, cond, text, seed=5, max_new=16, block=8,
                     max_new_tokens=3)
    eos = TINY.stop_speech_token
    if eos in out[:-1]:
        assert out[-1] == eos            # genuine early EOS
    else:
        assert out.shape[0] <= 3


@pytest.fixture(scope="module")
def tiny_tts(tmp_path_factory):
    """Tiny random ChatterboxTTS with a prepared synthetic voice (the
    test_pipeline.py pattern) for server-level continuous tests."""
    from tests.test_pipeline import TINY as PIPE_TINY
    from chatterbox_embed_tpu.tts import ChatterboxTTS
    import chatterbox_embed_tpu.models.t3 as t3mod
    import chatterbox_embed_tpu.tts as ttsmod
    t3mod._TEXT_BUCKETS = (24, 48)
    ttsmod._TOKEN_BUCKETS = (32, 64, 128)
    tts = ChatterboxTTS.from_random(seed=0, config=PIPE_TINY)
    rng_ = np.random.default_rng(5)
    t = np.arange(2 * 24_000) / 24_000
    wav = (0.3 * np.sin(2 * np.pi * 150 * t)
           + 0.01 * rng_.standard_normal(t.shape)).astype(np.float32)
    from chatterbox_embed_tpu.stitching.stitcher import write_wav
    d = tmp_path_factory.mktemp("cvoice")
    write_wav(str(d / "ref.wav"), wav, 24_000)
    prof = str(d / "voice.npy")
    tts.save_voice_profile(str(d / "ref.wav"), prof)
    tts.prepare_conditionals_with_voice_profile(prof, exaggeration=0.5)
    return tts


def test_streamed_buffers_freed_for_pump_only_consumers(tiny_tts):
    """A consumer that only reads pump()'s returned wav (the run-forever
    worker pattern) must not leak the streamed chunk buffers: at completion
    the full wav is delivered via pump's return and the per-chunk store is
    freed; a late first take_stream returns []."""
    from chatterbox_embed_tpu.serving.continuous import ContinuousServer
    srv = ContinuousServer(tiny_tts, slots=2, text_bucket=32,
                           max_new_tokens=16, block=8, vocode_batch=2)
    rid = srv.submit("Pump only consumer.", stream=True, seed=3,
                     max_new_tokens=16)
    finished = {}
    while not srv.idle:
        finished.update(srv.pump())
    assert rid in finished and finished[rid].size > 0
    assert rid not in srv._schunks and rid not in srv._sdone
    assert srv.take_stream(rid) == []


def test_phased_derivation_skipped_under_defer_kv(tiny_t3, rng, monkeypatch):
    """CHATTERBOX_DEFER_KV=1 (the parity-kept stacked-insert path) cannot
    run phased prefix reads — the derivation must fall back to the
    single-capacity decode instead of tripping llama.forward's read_len
    assert at trace time."""
    params, cond = tiny_t3, _cond(rng)
    monkeypatch.setenv("CHATTERBOX_DEFER_KV", "1")
    # force a long enough cap for the tiny config to derive K >= 2
    monkeypatch.setenv("CHATTERBOX_PHASED_CACHE", "2")
    out = t3.generate_batch(params, cond,
                            np.array([[5, 3, 7, 0]], np.int32),
                            max_new_tokens=80, cfg_weight=0.5,
                            temperature=1e-4, seed=0, cfg=TINY)
    assert out[0].size > 0
    assert t3.LAST_GENERATION_INFO["phase_totals"] == [
        t3.LAST_GENERATION_INFO["cache_total"]]
    # and the forced-K run WITHOUT defer does phase (the gate is defer,
    # not the env K)
    monkeypatch.delenv("CHATTERBOX_DEFER_KV")
    t3.generate_batch(params, cond, np.array([[5, 3, 7, 0]], np.int32),
                      max_new_tokens=80, cfg_weight=0.5,
                      temperature=1e-4, seed=0, cfg=TINY)
    assert len(t3.LAST_GENERATION_INFO["phase_totals"]) >= 2


def test_slot_derivation_honors_explicit_kv_int8(tiny_tts, monkeypatch):
    """An explicit kv_int8 argument must size the default slots against the
    cache the engine actually allocates, not the ambient env mode."""
    from chatterbox_embed_tpu.serving.continuous import ContinuousServer
    import chatterbox_embed_tpu.models.t3 as t3
    from chatterbox_embed_tpu.models.t3_engine import engine_geometry
    monkeypatch.delenv("CHATTERBOX_MAX_DECODE_UTT", raising=False)
    cfg = tiny_tts.cfg.t3
    bucket, cap_new = 32, 16
    _, capacity = engine_geometry(cfg, bucket,
                                  2 + cfg.perceiver_num_queries, cap_new)
    lcfg = cfg.llama
    per_tok_bf16 = lcfg.num_layers * 2 * lcfg.num_kv_heads * lcfg.head_dim * 2
    # envelope: 8 CFG slots of int8 cache, only 4 of bf16
    monkeypatch.setattr(t3, "KV_FENCE_BYTES", 4 * 2 * capacity * per_tok_bf16)
    monkeypatch.setenv("CHATTERBOX_INT8_KV", "1")
    srv_bf16 = ContinuousServer(tiny_tts, text_bucket=bucket,
                                max_new_tokens=cap_new, block=8,
                                kv_int8=False)
    assert srv_bf16.decoder.slots == 4     # NOT the int8-derived 8
    srv_int8 = ContinuousServer(tiny_tts, text_bucket=bucket,
                                max_new_tokens=cap_new, block=8,
                                kv_int8=True)
    assert srv_int8.decoder.slots == 8


def test_continuous_server_slots_honor_kv_fence(tiny_tts, monkeypatch):
    """Default slot derivation is CAPACITY-aware (round-5 fence): with the
    KV-bytes envelope shrunk so only 4 CFG slots fit at this engine
    geometry, ContinuousServer(slots=None) must build a 4-slot engine
    instead of the short-cap 16."""
    from chatterbox_embed_tpu.serving.continuous import ContinuousServer
    import chatterbox_embed_tpu.models.t3 as t3
    monkeypatch.delenv("CHATTERBOX_MAX_DECODE_UTT", raising=False)
    cfg = tiny_tts.cfg.t3
    lcfg = cfg.llama
    bucket, cap_new = 32, 16
    capacity = bucket + 2 + cfg.perceiver_num_queries + 2 + cap_new
    per_tok = lcfg.num_layers * 2 * lcfg.num_kv_heads * lcfg.head_dim * 2
    monkeypatch.setattr(t3, "KV_FENCE_BYTES", 4 * 2 * capacity * per_tok)
    srv = ContinuousServer(tiny_tts, text_bucket=bucket,
                           max_new_tokens=cap_new, block=8)
    assert srv.decoder.slots == 4


@pytest.mark.slow
def test_continuous_server_end_to_end(tiny_tts):
    """Three requests through a 2-slot server: all produce finite audio of
    the vocode-contract length (2 * cleaned_tokens * 480 samples)."""
    from chatterbox_embed_tpu.serving.continuous import ContinuousServer
    srv = ContinuousServer(tiny_tts, slots=2, text_bucket=32,
                           max_new_tokens=24, block=8, vocode_batch=2)
    texts = ["Hello world.", "A second test utterance.", "Third one."]
    rids = [srv.submit(t, seed=3 + i) for i, t in enumerate(texts)]
    wavs = srv.drain()
    assert not srv.failed
    assert set(rids) == set(wavs)
    for rid in rids:
        w = wavs[rid]
        assert w.ndim == 1 and w.size > 0 and np.isfinite(w).all()
        assert w.size % (2 * 480) == 0


def test_continuous_server_multi_voice(tiny_tts, tmp_path):
    """Per-request voices ride the multi-voice vocode bundle."""
    from chatterbox_embed_tpu.serving.continuous import ContinuousServer
    from chatterbox_embed_tpu.stitching.stitcher import write_wav
    rng_ = np.random.default_rng(9)
    t = np.arange(2 * 24_000) / 24_000
    wav2 = (0.2 * np.sin(2 * np.pi * 220 * t)
            + 0.01 * rng_.standard_normal(t.shape)).astype(np.float32)
    write_wav(str(tmp_path / "v2.wav"), wav2, 24_000)
    prof2 = str(tmp_path / "v2.npy")
    tiny_tts.save_voice_profile(str(tmp_path / "v2.wav"), prof2)
    conds1 = tiny_tts.conds          # prepare() below re-points tts.conds
    conds2 = tiny_tts._get_or_prepare_conditionals(
        voice_profile_path=prof2, exaggeration=0.5)

    srv = ContinuousServer(tiny_tts, slots=2, text_bucket=24,
                           max_new_tokens=16, block=8, vocode_batch=4)
    r1 = srv.submit("Voice one speaking.", conds=conds1, seed=1)
    r2 = srv.submit("Voice two speaking.", conds=conds2, seed=2)
    wavs = srv.drain()
    assert not srv.failed
    assert {r1, r2} == set(wavs)
    assert all(np.isfinite(w).all() and w.size > 0 for w in wavs.values())


@pytest.mark.slow
def test_streamed_request_matches_stream_generate(tiny_tts, monkeypatch):
    """submit(stream=True): the request's audio is synthesised incrementally
    from its slot's per-block tokens through the SAME WindowedSynth loop
    stream_generate runs — at near-greedy temperature the engine's token
    stream equals the lock-step stream (t3.generate parity), so the streamed
    chunks concatenate BIT-IDENTICALLY to stream_generate's output, and the
    completed wav pump() returns equals that concatenation."""
    from chatterbox_embed_tpu.serving.continuous import ContinuousServer
    monkeypatch.setenv("CHATTERBOX_FUSED_FIRST_CHUNK", "0")
    text = "Hello streaming world."
    kw = dict(temperature=1e-4, cfg_weight=0.5, seed=7)
    ref = np.concatenate(list(tiny_tts.stream_generate(
        text, block_tokens=8, max_new_tokens=16, **kw)))
    srv = ContinuousServer(tiny_tts, slots=2, text_bucket=32,
                           max_new_tokens=16, block=8, vocode_batch=2)
    rid = srv.submit(text, stream=True, max_new_tokens=16, **kw)
    chunks, finished = [], {}
    saw_early_chunk = False
    while not srv.idle:
        finished.update(srv.pump())
        new = srv.take_stream(rid)
        if new and rid not in finished:
            saw_early_chunk = True       # audio BEFORE the request completed
        chunks.extend(new)
    chunks.extend(srv.take_stream(rid))
    assert not srv.failed
    assert saw_early_chunk, "no chunk arrived before completion"
    got = np.concatenate(chunks)
    np.testing.assert_array_equal(got, ref)
    np.testing.assert_array_equal(finished[rid], ref)
    # buffers are released after the post-completion take
    assert rid not in srv._schunks


def test_streamed_request_under_traffic(tiny_tts):
    """A streamed request's audio is independent of surrounding traffic
    (request isolation extends through the windowed tail)."""
    from chatterbox_embed_tpu.serving.continuous import ContinuousServer

    def run(extra: int):
        srv = ContinuousServer(tiny_tts, slots=2, text_bucket=32,
                               max_new_tokens=16, block=8, vocode_batch=2)
        rid = srv.submit("Isolated stream target.", stream=True,
                         temperature=0.7, cfg_weight=0.5, seed=11,
                         max_new_tokens=16)
        for i in range(extra):
            srv.submit(f"Background req {i}.", temperature=0.8,
                       cfg_weight=0.5, seed=100 + i, max_new_tokens=16)
        chunks = []
        while not srv.idle:
            srv.pump()
            chunks.extend(srv.take_stream(rid))
        chunks.extend(srv.take_stream(rid))
        return np.concatenate(chunks)

    alone = run(0)
    busy = run(3)
    np.testing.assert_array_equal(alone, busy)


def test_continuous_first_pass_gate(tiny_tts, monkeypatch):
    """CHATTERBOX_CONTINUOUS=1 routes the batched chunk first pass through
    the slot-refill engine; the {row: wav} contract (and the callers'
    retry-pyramid fallback for missing rows) is unchanged."""
    monkeypatch.setenv("CHATTERBOX_CONTINUOUS", "1")
    texts = ["Hello there.", "Another chunk.", "Third chunk here."]
    p = dict(temperature=0.7, cfg_weight=0.5, repetition_penalty=1.2,
             min_p=0.05, top_p=1.0, exaggeration=0.5)
    out = tiny_tts._batched_first_pass(texts, [dict(p) for _ in texts],
                                       tiny_tts.conds, max_new_tokens=16,
                                       seed=0)
    assert set(out) <= {0, 1, 2} and out
    for w in out.values():
        assert np.isfinite(w).all() and w.size > 0


def test_story_server_end_to_end(tiny_tts):
    """Whole stories through the engine: chunking, stitching, watermark and
    metadata match the generate_long_text contract; a story break yields two
    chunks; two stories interleave on one engine."""
    from chatterbox_embed_tpu.serving.continuous import ContinuousStoryServer
    srv = ContinuousStoryServer(tiny_tts, slots=2, text_bucket=32,
                                max_new_tokens=24, block=8, vocode_batch=2)
    j1 = srv.submit_story("The knight rode far. ⁂ The dragon was kind.",
                          tiny_tts.conds, seed=1)
    j2 = srv.submit_story("A quiet morning by the sea.", tiny_tts.conds,
                          seed=2)
    out = srv.drain()
    assert srv.idle
    assert {j1, j2} == set(out)
    wav1, meta1 = out[j1]
    assert wav1.ndim == 2 and wav1.shape[0] == 1 and np.isfinite(wav1).all()
    assert meta1["num_chunks"] == 2                 # the story break split
    assert meta1["chunk_stats"]["continuous"] is True
    assert meta1["duration_s"] > 0
    assert all(c["attempts"] >= 1 for c in meta1["chunk_stats"]["chunks"])
    _wav2, meta2 = out[j2]
    assert meta2["num_chunks"] == 1


def test_story_server_retry_reenters_engine(tiny_tts, monkeypatch):
    """A gate-failing chunk re-enters the ENGINE with the sequential
    pyramid's drift (never blocks the loop); QA exhaustion keeps the last
    take, exactly like the lock-step retry semantics."""
    from chatterbox_embed_tpu.serving.continuous import ContinuousStoryServer
    monkeypatch.setattr(tiny_tts, "_chunk_gates_ok",
                        lambda flat, info: (False, "qa"))
    srv = ContinuousStoryServer(tiny_tts, slots=1, text_bucket=32,
                                max_new_tokens=24, block=8, vocode_batch=1,
                                max_attempts=2)
    jid = srv.submit_story("A single short chunk.", tiny_tts.conds, seed=4)
    out = srv.drain()
    wav, meta = out[jid]
    chunk = meta["chunk_stats"]["chunks"][0]
    assert chunk["attempts"] == 2                   # one engine re-entry
    assert meta["chunk_stats"]["regenerations"] >= 1
    assert np.isfinite(wav).all() and wav.size > 0  # last take kept


def test_story_server_rejects_oversized_chunks(tiny_tts):
    """A story whose chunks exceed the engine bucket raises at submit,
    atomically (nothing enters the engine) — the worker falls back to the
    lock-step path on this."""
    from chatterbox_embed_tpu.serving.continuous import ContinuousStoryServer
    srv = ContinuousStoryServer(tiny_tts, slots=1, text_bucket=8,
                                max_new_tokens=8, block=4)
    with pytest.raises(ValueError):
        srv.submit_story("This sentence is very much longer than an eight "
                         "token engine bucket could ever hold at once.",
                         tiny_tts.conds)
    assert srv.idle and not srv._rid_map


def test_engine_rejects_oversized_text_and_promptless_cond(tiny_t3, rng):
    eng = t3_engine.ContinuousDecoder(tiny_t3, TINY, slots=1, text_bucket=8,
                                      max_new_tokens=8, block=4)
    with pytest.raises(ValueError):
        eng.submit(_text(rng, 12), _cond(rng))
    bad = t3.T3Cond(speaker_emb=jnp.zeros((1, 16)))
    with pytest.raises(ValueError):
        eng.submit(_text(rng, 3), bad)
    with pytest.raises(ValueError):
        eng.submit(_text(rng, 3), _cond(rng), top_p=0.9)


# -- multi-chip engine (8-virtual-CPU-device mesh, like test_parallel.py) ----


def test_engine_on_dp_mesh_matches_single_device(tiny_t3, rng):
    """Slot axes sharded over dp reproduce the single-device engine
    token-for-token: every engine op is row-local (per-row masks, RoPE
    positions, PRNG chains), so GSPMD placement cannot change the
    arithmetic. Covers refill-into-a-sharded-state too (4 requests through
    2 slots)."""
    from chatterbox_embed_tpu.parallel import make_dp_mesh
    from chatterbox_embed_tpu.parallel.serve import replicate
    cond = _cond(rng)
    texts = [_text(rng, n=4 + i) for i in range(4)]

    def run(params, mesh):
        eng = t3_engine.ContinuousDecoder(
            params, TINY, slots=2, text_bucket=16, max_new_tokens=12,
            block=4, mesh=mesh)
        rids = [eng.submit(t, cond, seed=7 + i, temperature=0.8,
                           cfg_weight=0.5) for i, t in enumerate(texts)]
        out = eng.drain()
        return [out[r] for r in rids]

    ref = run(tiny_t3, None)
    mesh = make_dp_mesh(2)
    got = run(replicate(mesh, tiny_t3), mesh)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)


def test_engine_on_dp_tp_mesh_near_greedy(tiny_t3, rng):
    """Combined dp x tp mesh: slots over dp, Megatron weights over tp.
    tp splits the per-layer reductions, so float order changes — near-greedy
    sampling makes the token stream insensitive to that and must match
    t3.generate exactly (the same cross-validation the single-chip engine
    is pinned by)."""
    from chatterbox_embed_tpu.parallel import make_dp_tp_mesh
    from chatterbox_embed_tpu.parallel.serve import shard_t3_for_serving
    cond = _cond(rng)
    text = _text(rng)
    ref = t3.generate(tiny_t3, cond, text, max_new_tokens=12,
                      temperature=1e-4, cfg_weight=0.5, seed=3, cfg=TINY)
    mesh = make_dp_tp_mesh(8, tp=4)          # dp=2 x tp=4 (4 heads)
    sp = shard_t3_for_serving(mesh, tiny_t3)
    eng = t3_engine.ContinuousDecoder(
        sp, TINY, slots=2, text_bucket=16, max_new_tokens=12, block=4,
        mesh=mesh)
    rid = eng.submit(text, cond, seed=11, temperature=1e-4, cfg_weight=0.5)
    got = eng.drain()[rid]
    np.testing.assert_array_equal(np.asarray(ref), got)


def test_engine_mesh_rejects_indivisible_slots(tiny_t3):
    from chatterbox_embed_tpu.parallel import make_dp_mesh
    from chatterbox_embed_tpu.parallel.serve import replicate
    mesh = make_dp_mesh(4)
    with pytest.raises(ValueError, match="divide the dp axis"):
        t3_engine.ContinuousDecoder(replicate(mesh, tiny_t3), TINY, slots=3,
                                    text_bucket=16, max_new_tokens=8,
                                    block=4, mesh=mesh)


def test_continuous_server_on_mesh(tiny_tts):
    """ContinuousServer picks up a mesh-enabled ChatterboxTTS transparently
    (tts.mesh -> sharded engine state): the serving default composes with
    WORKER_MESH. Audio contract unchanged."""
    import copy
    tts2 = copy.copy(tiny_tts)
    tts2.enable_mesh(4, tp=2)                # dp=2 x tp=2
    from chatterbox_embed_tpu.serving.continuous import ContinuousServer
    srv = ContinuousServer(tts2, slots=2, text_bucket=24,
                           max_new_tokens=16, block=8, vocode_batch=2)
    assert srv.decoder.mesh is tts2.mesh
    rids = [srv.submit(t, seed=5 + i) for i, t in
            enumerate(["Hello mesh.", "Second row."])]
    # streaming synthesis is single-chip: a mesh server rejects stream=True
    # loudly instead of failing inside the windowed tail
    with pytest.raises(ValueError, match="mesh-enabled"):
        srv.submit("No stream on mesh.", stream=True)
    wavs = srv.drain()
    assert not srv.failed and set(rids) == set(wavs)
    for w in wavs.values():
        assert w.ndim == 1 and w.size > 0 and np.isfinite(w).all()


def test_vocode_failure_preserves_completions(tiny_tts, monkeypatch):
    """A transient vocode failure must not lose completed decodes: the
    flushed batch is restored to the ready queue and the next pump retries
    it (regression: pop-before-vocode dropped requests forever)."""
    from chatterbox_embed_tpu.serving.continuous import ContinuousServer
    srv = ContinuousServer(tiny_tts, slots=2, text_bucket=32,
                           max_new_tokens=16, block=8, vocode_batch=1)
    rid = srv.submit("Hello there.", seed=7)
    real = type(tiny_tts)._vocode_batch
    calls = {"n": 0}

    def flaky(self, *a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient OOM")
        return real(self, *a, **k)

    monkeypatch.setattr(type(tiny_tts), "_vocode_batch", flaky)
    with pytest.raises(RuntimeError, match="transient OOM"):
        while True:
            srv.pump()
    assert srv._ready, "completed decode must survive the failed flush"
    wavs = srv.drain()
    assert rid in wavs and np.isfinite(wavs[rid]).all()
    assert calls["n"] == 2


def test_serving_paths_do_not_accumulate_results(tiny_tts):
    """Run-forever ownership: the story server consumes results from pump's
    return value — neither the inner server's wav dict nor the engine's
    result dict may retain them (host-memory leak at serving timescales)."""
    from chatterbox_embed_tpu.serving.continuous import ContinuousStoryServer
    srv = ContinuousStoryServer(tiny_tts, slots=2, text_bucket=48,
                                max_new_tokens=16, block=8, vocode_batch=1)
    jid = srv.submit_story("One line here.", tiny_tts.conds, seed=3)
    out = srv.drain()
    assert jid in out
    assert srv.srv._wavs == {}
    assert srv.srv.decoder._results == {}
    assert srv.srv._ready == [] and srv._jobs == {}


def test_vocode_batch_sub_batch_slicing_order_and_trim(tiny_tts, monkeypatch):
    """Pin the enqueue-all-then-fetch vocode loop's bookkeeping (the q4af
    overlap refactor): with a forced sub-batch of 2, a 5-row batch must
    dispatch exactly the row slices [0:2],[2:4],[4:5] of the padded token
    matrix, and outs[i] must be dispatch-row i trimmed to 2*len_i*480
    samples, in submission order. A spy token_to_wav returns a wav that
    encodes (row identity, sample index) so any slice/order/trim slip is a
    value mismatch, not just a shape one."""
    from chatterbox_embed_tpu import tts as ttsmod

    lens = [3, 5, 2, 4, 1]
    rng_ = np.random.default_rng(11)
    token_lists = [rng_.integers(1, 30, size=n).astype(np.int32)
                   for n in lens]
    monkeypatch.setenv("CHATTERBOX_S3GEN_SUB_BATCH", "2")
    seen = []

    def spy_token_to_wav(params, tokens, token_len, prompt_token,
                         prompt_feat, embedding, **kw):
        tok = np.asarray(tokens)
        seen.append(tok.copy())
        b, bkt = tok.shape
        t = np.arange(2 * bkt * 480, dtype=np.float32)
        # row fingerprint: first real token id * 1e6 + sample index
        return jnp.asarray(tok[:, :1].astype(np.float32) * 1e6 + t[None, :])

    monkeypatch.setattr(ttsmod.s3gen_mod, "token_to_wav", spy_token_to_wav)
    outs, out_lens = tiny_tts._vocode_batch(
        token_lists, conds=tiny_tts.conds, seed=7)

    assert out_lens == lens
    assert [s.shape[0] for s in seen] == [2, 2, 1]   # slices [0:2],[2:4],[4:5]
    for i, (w, toks) in enumerate(zip(outs, token_lists)):
        assert w.shape == (2 * lens[i] * 480,)
        expect = toks[0] * 1e6 + np.arange(2 * lens[i] * 480,
                                           dtype=np.float32)
        np.testing.assert_array_equal(np.asarray(w), expect)
    # the padded rows the dispatches saw are exactly the submission order
    flat_rows = np.concatenate(seen, axis=0)
    for i, toks in enumerate(token_lists):
        np.testing.assert_array_equal(flat_rows[i, :lens[i]], toks)
        assert (flat_rows[i, lens[i]:] == 0).all()


def test_vocode_batch_multi_dispatch_real_and_deterministic(tiny_tts,
                                                            monkeypatch):
    """Real tiny-model run with a forced 2-row sub-batch (3 dispatches):
    every row's wav is finite, carries the 2*len*480 vocode contract, and
    an identical second call is bit-identical (the enqueue-all overlap must
    not introduce any cross-dispatch state)."""
    monkeypatch.setenv("CHATTERBOX_S3GEN_SUB_BATCH", "2")
    rng_ = np.random.default_rng(13)
    lens = [4, 6, 3, 5, 2]
    token_lists = [rng_.integers(1, 30, size=n).astype(np.int32)
                   for n in lens]
    outs1, l1 = tiny_tts._vocode_batch(token_lists, conds=tiny_tts.conds,
                                       seed=5)
    outs2, l2 = tiny_tts._vocode_batch(token_lists, conds=tiny_tts.conds,
                                       seed=5)
    assert l1 == lens and l2 == lens
    for i, (a, b) in enumerate(zip(outs1, outs2)):
        assert a.shape == (2 * lens[i] * 480,)
        assert np.isfinite(a).all()
        np.testing.assert_array_equal(a, b)
