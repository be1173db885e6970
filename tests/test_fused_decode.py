"""Parity for the monolithic weight-streaming decode-step kernel
(kernels/fused_decode.py) vs the XLA t==1 decode path in models/llama.py —
interpret mode on CPU, the same recipe as test_kernels.py."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chatterbox_embed_tpu.config import LlamaConfig
from chatterbox_embed_tpu.models import llama
from chatterbox_embed_tpu.kernels import fused_decode

CFG = LlamaConfig(hidden_size=128, intermediate_size=256, num_layers=3,
                  num_heads=2, num_kv_heads=2, head_dim=64)


def _prefill(params, cfg, b, p_len, pad, total, rng):
    ctx = jnp.asarray(rng.standard_normal((b, p_len, cfg.hidden_size)),
                      jnp.float32)
    idx = jnp.arange(p_len)
    kidx = jnp.arange(total)
    mask = ((kidx[None, :] <= idx[:, None]) & (kidx[None, :] >= pad))[None]
    pos = jnp.broadcast_to(jnp.maximum(idx - pad, 0)[None], (b, p_len))
    cache = llama.init_cache(cfg, b, total, jnp.float32)
    h, cache = llama.forward(params, ctx, pos, mask, cache=cache,
                             cache_pos=0, cfg=cfg)
    return h, cache


def _xla_step(params, cfg, x, cache, cache_pos, pad, total):
    mask = (jnp.arange(total)[None, None, :] <= cache_pos) & \
           (jnp.arange(total)[None, None, :] >= pad)
    pos_id = jnp.full((x.shape[0], 1), cache_pos - pad, jnp.int32)
    return llama.forward(params, x[:, None, :], pos_id, mask, cache=cache,
                         cache_pos=cache_pos, cfg=cfg)


@pytest.mark.parametrize("pad", [0, 7])
def test_fused_step_matches_xla_decode(rng, pad):
    b, total, p_len = 2, 256, 40
    params = llama.init(jax.random.PRNGKey(0), CFG)
    _, cache = _prefill(params, CFG, b, p_len, pad, total, rng)
    fused = fused_decode.stack_for_fused(params, CFG, jnp.float32)

    x = jnp.asarray(rng.standard_normal((b, CFG.hidden_size)), jnp.float32)
    cache_pos = jnp.int32(p_len)

    ref_h, ref_cache = _xla_step(params, CFG, x, cache, cache_pos, pad, total)
    out_h, k2, v2 = fused_decode.fused_decode_step(
        fused, x, cache.k, cache.v, cache_pos, jnp.int32(pad), CFG,
        dtype=jnp.float32)

    np.testing.assert_allclose(np.asarray(out_h), np.asarray(ref_h[:, 0]),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(k2), np.asarray(ref_cache.k),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(ref_cache.v),
                               atol=2e-5, rtol=2e-5)


def test_fused_step_chain(rng):
    """Three consecutive steps: the kernel must consume its own cache
    writes (the step-t row written at pos must be attended at t+1)."""
    b, total, p_len, pad = 2, 256, 21, 3
    params = llama.init(jax.random.PRNGKey(1), CFG)
    _, cache_x = _prefill(params, CFG, b, p_len, pad, total, rng)
    fused = fused_decode.stack_for_fused(params, CFG, jnp.float32)
    ck, cv = cache_x.k, cache_x.v
    cache_r = cache_x
    for t in range(3):
        x = jnp.asarray(rng.standard_normal((b, CFG.hidden_size)), jnp.float32)
        cache_pos = jnp.int32(p_len + t)
        ref_h, cache_r = _xla_step(params, CFG, x, cache_r, cache_pos,
                                   pad, total)
        out_h, ck, cv = fused_decode.fused_decode_step(
            fused, x, ck, cv, cache_pos, jnp.int32(pad), CFG,
            dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out_h),
                                   np.asarray(ref_h[:, 0]),
                                   atol=5e-5, rtol=5e-5, err_msg=f"step {t}")


def test_generate_with_fused_step_matches_xla(rng, monkeypatch):
    """End-to-end t3.generate through the decode_block fused branch
    (CHATTERBOX_PALLAS=1 engages it in interpret mode on CPU) must produce
    the same tokens as the plain XLA decode path."""
    from chatterbox_embed_tpu.config import T3Config
    from chatterbox_embed_tpu.models import t3

    tcfg = T3Config(llama=CFG, text_tokens_dict_size=50,
                    speech_tokens_dict_size=40, start_speech_token=36,
                    stop_speech_token=37, max_text_tokens=64,
                    max_speech_tokens=128, speaker_embed_size=16,
                    speech_cond_prompt_len=6)
    params = t3.init(jax.random.PRNGKey(3), tcfg)
    cond = t3.T3Cond(
        speaker_emb=jnp.asarray(rng.standard_normal((1, 16)), jnp.float32),
        cond_prompt_speech_tokens=jnp.asarray(
            rng.integers(0, 36, (1, 6)).astype(np.int32)),
        emotion_adv=0.5)
    text = np.concatenate([[5], rng.integers(1, 50, 9), [0]])[None].astype(np.int32)
    kw = dict(max_new_tokens=12, temperature=0.7, cfg_weight=0.4, seed=4,
              cfg=tcfg)

    monkeypatch.setenv("CHATTERBOX_PALLAS", "0")
    ref = t3.generate(params, cond, text, **kw)
    assert t3.LAST_GENERATION_INFO["use_fused"] is False

    # fused step is OPT-IN (measured slower than the per-op path on v5e;
    # PERF_NOTES.md round-3 fused-step study) — pallas alone must not engage it
    monkeypatch.setenv("CHATTERBOX_PALLAS", "1")
    out_default = t3.generate(params, cond, text, **kw)
    assert t3.LAST_GENERATION_INFO["use_fused"] is False
    np.testing.assert_array_equal(out_default, ref)

    monkeypatch.setenv("CHATTERBOX_FUSED_STEP", "1")
    out = t3.generate(params, cond, text, **kw)
    assert t3.LAST_GENERATION_INFO["use_fused"] is True
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("bc,nbuf,kvchunk", [(64, 2, 64), (128, 3, 128),
                                             (32, 6, 256)])
def test_fused_step_geometry_variants(rng, monkeypatch, bc, nbuf, kvchunk):
    """Non-default CHATTERBOX_FUSED_{BC,NBUF,KV_CHUNK} geometries must stay
    bit-equivalent to the XLA step — a re-sweep (scripts/
    sweep_fused_geometry.py) must not be able to pick a broken config.
    Calls __wrapped__ because the jit cache cannot see module-global
    geometry changes (same trap the sweep script dodges)."""
    monkeypatch.setattr(fused_decode, "_BC_TARGET", bc)
    monkeypatch.setattr(fused_decode, "_NBUF", nbuf)
    monkeypatch.setattr(fused_decode, "_KV_CHUNK", kvchunk)
    b, total, p_len, pad = 2, 256, 33, 5
    assert fused_decode.plan(CFG, b)["bc"] == bc
    params = llama.init(jax.random.PRNGKey(2), CFG)
    _, cache = _prefill(params, CFG, b, p_len, pad, total, rng)
    fused = fused_decode.stack_for_fused(params, CFG, jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, CFG.hidden_size)), jnp.float32)
    cache_pos = jnp.int32(p_len)
    ref_h, ref_cache = _xla_step(params, CFG, x, cache, cache_pos, pad, total)
    out_h, k2, v2 = fused_decode.fused_decode_step.__wrapped__(
        fused, x, cache.k, cache.v, cache_pos, jnp.int32(pad), CFG,
        dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(ref_h[:, 0]),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(k2), np.asarray(ref_cache.k),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(ref_cache.v),
                               atol=2e-5, rtol=2e-5)


def test_plan_rejects_unsupported():
    assert fused_decode.plan(LlamaConfig(hidden_size=128, num_heads=4,
                                         num_kv_heads=2, head_dim=32), 2) is None
    assert fused_decode.plan(CFG, 2) is not None
    assert fused_decode.plan(LlamaConfig(), 2) is not None   # the real T3
