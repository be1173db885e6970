"""Multi-chip paths on the 8-virtual-CPU-device mesh: dp-sharded batched
inference and dp x tp training steps."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from chatterbox_embed_tpu.config import T3Config, LlamaConfig
from chatterbox_embed_tpu.models import t3
from chatterbox_embed_tpu.parallel import make_dp_mesh, make_mesh

TINY = T3Config(
    llama=LlamaConfig(hidden_size=64, intermediate_size=128, num_layers=2,
                      num_heads=4, num_kv_heads=4, head_dim=16),
    text_tokens_dict_size=50, speech_tokens_dict_size=40,
    start_speech_token=36, stop_speech_token=37,
    max_text_tokens=64, max_speech_tokens=128,
    speaker_embed_size=16, speech_cond_prompt_len=6)


def _cond(rng):
    return t3.T3Cond(
        speaker_emb=jnp.asarray(rng.standard_normal((1, 16)).astype(np.float32)),
        cond_prompt_speech_tokens=jnp.asarray(rng.integers(0, 36, (1, 6)).astype(np.int32)),
        emotion_adv=0.5)


def test_dp_sharded_batch_matches_single_device(rng):
    assert len(jax.devices()) >= 4
    params = t3.init(jax.random.PRNGKey(0), TINY)
    texts = rng.integers(1, 50, (4, 10)).astype(np.int32)
    texts[:, 0] = 5
    texts[:, -1] = 0
    kw = dict(max_new_tokens=12, cfg_weight=0.4, seed=9, cfg=TINY)
    cond = _cond(rng)
    plain = t3.generate_batch(params, cond, texts, **kw)
    mesh = make_dp_mesh(4)
    sharded = t3.generate_batch(params, cond, texts, mesh=mesh, **kw)
    assert len(plain) == len(sharded) == 4
    for a, b in zip(plain, sharded):
        np.testing.assert_array_equal(a, b)


def test_dp_sharded_phased_cache_matches_single_device(rng, monkeypatch):
    """Phased prefix reads under a dp mesh (VERDICT r4 #6): the per-phase
    read_len is a STATIC slice inside the compiled program, so it rides
    GSPMD over dp-sharded rows with no host-side cache surgery — the
    decode must engage >= 2 phases and stay bit-identical to both the
    single-device phased run and the unphased mesh run."""
    assert len(jax.devices()) >= 4
    params = t3.init(jax.random.PRNGKey(0), TINY)
    texts = rng.integers(1, 50, (4, 10)).astype(np.int32)
    texts[:, 0] = 5
    cond = _cond(rng)
    kw = dict(max_new_tokens=90, cfg_weight=0.4, seed=11, cfg=TINY)
    monkeypatch.setenv("CHATTERBOX_PHASED_CACHE", "0")
    base = t3.generate_batch(params, cond, texts, **kw)
    monkeypatch.setenv("CHATTERBOX_PHASED_CACHE", "3")
    single = t3.generate_batch(params, cond, texts, **kw)
    assert len(t3.LAST_GENERATION_INFO["phase_totals"]) >= 2
    mesh = make_dp_mesh(4)
    sharded = t3.generate_batch(params, cond, texts, mesh=mesh, **kw)
    assert len(t3.LAST_GENERATION_INFO["phase_totals"]) >= 2
    assert t3.LAST_GENERATION_INFO["mesh"] == {"dp": 4}
    for a, b, c in zip(base, single, sharded):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, c)


@pytest.mark.slow
def test_dp_tp_combined_batch(rng):
    """Combined serving mesh (VERDICT r3 #7): rows over dp AND Megatron
    weights over tp in one generate_batch call. tp psums reassociate, so
    assert prefill-logit closeness vs single-device plus a valid decode."""
    from chatterbox_embed_tpu.parallel import (make_dp_tp_mesh,
                                               shard_t3_for_serving)
    assert len(jax.devices()) >= 8
    params = t3.init(jax.random.PRNGKey(0), TINY)
    cond = _cond(rng)
    texts = rng.integers(1, 50, (4, 10)).astype(np.int32)
    texts[:, 0] = 5
    texts[:, -1] = 0
    mesh = make_dp_tp_mesh(8)            # 2x4: 8 CFG rows over dp=2
    assert mesh.shape == {"dp": 2, "tp": 4}
    sv = shard_t3_for_serving(mesh, params)
    s_ref, _ = t3.start_generation(params, cond, texts, cfg_weight=0.4,
                                   max_new_tokens=12, cfg=TINY)
    s_dptp, _ = t3.start_generation(sv, cond, texts, cfg_weight=0.4,
                                    max_new_tokens=12, mesh=mesh, cfg=TINY)
    np.testing.assert_allclose(np.asarray(s_dptp.logits),
                               np.asarray(s_ref.logits), atol=2e-4, rtol=2e-4)
    out = t3.generate_batch(sv, cond, texts, mesh=mesh, max_new_tokens=12,
                            cfg_weight=0.4, seed=9, cfg=TINY)
    assert len(out) == 4
    for toks in out:
        assert toks.size >= 1
        assert np.all((toks >= 0) & (toks < TINY.speech_tokens_dict_size))
    assert t3.LAST_GENERATION_INFO["mesh"] == {"dp": 2, "tp": 4}
    # conds whose arrays are COMMITTED to one device (the audio-prompt
    # tokenizer path) must still work: the mesh branch replicates them
    # (round-4 regression — eager context build with mixed device sets)
    committed = t3.T3Cond(
        speaker_emb=jax.device_put(cond.speaker_emb, jax.devices()[0]),
        cond_prompt_speech_tokens=jax.device_put(
            cond.cond_prompt_speech_tokens, jax.devices()[0]),
        emotion_adv=0.5)
    out_c = t3.generate_batch(sv, committed, texts, mesh=mesh,
                              max_new_tokens=12, cfg_weight=0.4, seed=9,
                              cfg=TINY)
    assert len(out_c) == 4 and all(o.size >= 1 for o in out_c)
    # a dp-only serving mesh replicates instead of Megatron-sharding
    dp_mesh = make_dp_tp_mesh(4, tp=1)
    sv_dp = shard_t3_for_serving(dp_mesh, params)
    plain = t3.generate_batch(params, cond, texts, max_new_tokens=12,
                              cfg_weight=0.4, seed=9, cfg=TINY)
    same = t3.generate_batch(sv_dp, cond, texts, mesh=dp_mesh,
                             max_new_tokens=12, cfg_weight=0.4, seed=9, cfg=TINY)
    for a, b in zip(plain, same):
        np.testing.assert_array_equal(a, b)


def test_training_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.devices.shape in ((2, 4), (4, 2), (8, 1))
    assert mesh.axis_names == ("dp", "tp")


def test_tp_sharded_decode_matches_single_device(rng):
    """Latency tp: Megatron-sharded backbone over a tp-only mesh. The psum
    reassociates the o/down reductions, so exact token equality would be
    tie-flip flaky; assert prefill-logit closeness and a valid decoded
    stream instead."""
    from chatterbox_embed_tpu.parallel import make_tp_mesh, shard_t3_for_decode
    assert len(jax.devices()) >= 4
    params = t3.init(jax.random.PRNGKey(0), TINY)
    cond = _cond(rng)
    text = rng.integers(1, 50, (1, 10)).astype(np.int32)
    kw = dict(max_new_tokens=12, cfg_weight=0.4, seed=9, cfg=TINY)

    state0, _ = t3.start_generation(params, cond, text, cfg_weight=0.4,
                                    max_new_tokens=12, cfg=TINY)

    mesh = make_tp_mesh(4)
    tp_params = shard_t3_for_decode(mesh, params)
    tp = t3.generate(tp_params, cond, text, mesh=mesh, **kw)
    state1, _ = t3.start_generation(tp_params, cond, text, cfg_weight=0.4,
                                    max_new_tokens=12, mesh=mesh, cfg=TINY)

    np.testing.assert_allclose(np.asarray(state0.logits),
                               np.asarray(state1.logits), atol=2e-4, rtol=2e-4)
    assert tp.size >= 1 and tp.dtype == np.int32
    assert np.all((tp >= 0) & (tp < TINY.speech_tokens_dict_size))


def _pp_batch(rng, b=4):
    return {
        "speaker_emb": jnp.asarray(rng.standard_normal((b, 16)).astype(np.float32)),
        "cond_prompt_tokens": jnp.asarray(rng.integers(0, 36, (b, 6)).astype(np.int32)),
        "emotion_adv": jnp.full((b,), 0.5, jnp.float32),
        "text_tokens": jnp.asarray(rng.integers(1, 50, (b, 8)).astype(np.int32)),
        "text_lens": jnp.asarray([8, 6, 7, 8], jnp.int32),
        "speech_tokens": jnp.asarray(rng.integers(0, 36, (b, 10)).astype(np.int32)),
        "speech_lens": jnp.asarray([10, 9, 10, 8], jnp.int32),
    }


@pytest.mark.slow
def test_pp_pipeline_loss_matches_single_device(rng):
    """Pipeline-parallel T3 loss over 4 stages x 2 microbatches must equal
    the plain single-device t3.loss (same math, scheduled across a pp mesh)
    — and so must the gradients of both replicated and staged params."""
    from chatterbox_embed_tpu.parallel import pipeline as pp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    cfg = T3Config(
        llama=LlamaConfig(hidden_size=64, intermediate_size=128, num_layers=4,
                          num_heads=4, num_kv_heads=4, head_dim=16),
        text_tokens_dict_size=50, speech_tokens_dict_size=40,
        start_speech_token=36, stop_speech_token=37,
        max_text_tokens=64, max_speech_tokens=128,
        speaker_embed_size=16, speech_cond_prompt_len=6)
    params = t3.init(jax.random.PRNGKey(1), cfg)
    batch = _pp_batch(rng)

    def ref_loss(params, batch):
        cond = t3.T3Cond(speaker_emb=batch["speaker_emb"],
                         cond_prompt_speech_tokens=batch["cond_prompt_tokens"],
                         emotion_adv=batch["emotion_adv"])
        lt, ls = t3.loss(params, cond, batch["text_tokens"], batch["text_lens"],
                         batch["speech_tokens"], batch["speech_lens"], cfg)
        return lt + ls

    ref, ref_grads = jax.value_and_grad(ref_loss)(params, batch)

    n_stages, n_micro = 4, 2
    mesh = pp.make_pp_mesh(n_stages)
    pp_params = pp.shard_pp_params(pp.stack_t3_for_pipeline(params, n_stages), mesh)

    def pipelined(pp_params, batch):
        return shard_map(
            lambda p, b: pp.pp_loss(p, b, n_stages, n_micro, cfg),
            mesh=mesh,
            in_specs=(pp.pp_param_spec(pp_params),
                      jax.tree.map(lambda _: P(), batch)),
            out_specs=P(), check_vma=False)(pp_params, batch)

    loss, grads = jax.value_and_grad(pipelined)(pp_params, batch)
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-5, atol=1e-6)

    # gradient parity: a replicated head leaf and a staged layer leaf
    np.testing.assert_allclose(
        np.asarray(grads["aux"]["speech_head"]["w"]),
        np.asarray(ref_grads["speech_head"]["w"]), rtol=2e-4, atol=1e-6)
    g_stage = np.asarray(grads["stages"]["q"]["w"])           # (S, K, in, out)
    for li in range(4):
        np.testing.assert_allclose(
            g_stage[li, 0],
            np.asarray(ref_grads["llama"]["layers"][li]["q"]["w"]),
            rtol=2e-4, atol=1e-6)
    # round-trip: unstack returns the original tree layout
    rt = pp.unstack_t3_from_pipeline(pp_params, cfg)
    np.testing.assert_allclose(np.asarray(rt["llama"]["layers"][2]["gate"]["w"]),
                               np.asarray(params["llama"]["layers"][2]["gate"]["w"]))


def test_pp_train_step_runs(rng):
    """One pipelined optimizer step: loss finite, params move, step counts."""
    from chatterbox_embed_tpu.parallel import pipeline as pp
    cfg = T3Config(
        llama=LlamaConfig(hidden_size=64, intermediate_size=128, num_layers=4,
                          num_heads=4, num_kv_heads=4, head_dim=16),
        text_tokens_dict_size=50, speech_tokens_dict_size=40,
        start_speech_token=36, stop_speech_token=37,
        max_text_tokens=64, max_speech_tokens=128,
        speaker_embed_size=16, speech_cond_prompt_len=6)
    params = t3.init(jax.random.PRNGKey(2), cfg)
    mesh = pp.make_pp_mesh(4)
    pp_params = pp.shard_pp_params(pp.stack_t3_for_pipeline(params, 4), mesh)
    step, init_state = pp.make_pp_train_step(mesh, n_micro=2, cfg=cfg)
    state = init_state(pp_params)
    batch = _pp_batch(rng)
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
    before = np.asarray(pp_params["stages"]["q"]["w"])
    after = np.asarray(state2.params["stages"]["q"]["w"])
    assert np.abs(after - before).max() > 0


def test_sp_generate_mel_matches_single_device(rng):
    """Sequence-parallel CFM: T sharded over 4 chips must reproduce the
    single-device solver (halo-exchanged convs + all-gathered KV attention
    are the same math, just re-laid-out)."""
    from chatterbox_embed_tpu.config import CFMConfig, FlowDecoderConfig
    from chatterbox_embed_tpu.models import cfm, flow_decoder
    from chatterbox_embed_tpu.parallel import make_sp_mesh, sp_generate_mel

    dec_cfg = FlowDecoderConfig(in_channels=32, out_channels=8, channels=16,
                                attention_head_dim=8, num_heads=2, n_blocks=1,
                                num_mid_blocks=2, time_embed_dim=64)
    cfm_cfg = CFMConfig(n_timesteps=4)
    params = flow_decoder.init(jax.random.PRNGKey(7), dec_cfg)
    b, t, nf = 2, 24, 8
    mu = jnp.asarray(rng.standard_normal((b, t, nf)).astype(np.float32))
    spks = jnp.asarray(rng.standard_normal((b, nf)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((b, t, nf)).astype(np.float32))
    lens = np.array([t, t - 5])
    mask = jnp.asarray((np.arange(t)[None, :] < lens[:, None])
                       .astype(np.float32))[..., None]

    ref = cfm.generate_mel(params, mu, spks, cond, mask,
                           cfm=cfm_cfg, dec_cfg=dec_cfg)
    mesh = make_sp_mesh(4)
    out = sp_generate_mel(mesh, params, mu, spks, cond, mask,
                          cfm_cfg=cfm_cfg, dec_cfg=dec_cfg)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_sp_generate_mel_ragged_t(rng):
    """T not divisible by the shard count: the pad frames must not leak
    into the result (they are masked out of attention and convs)."""
    from chatterbox_embed_tpu.config import CFMConfig, FlowDecoderConfig
    from chatterbox_embed_tpu.models import cfm, flow_decoder
    from chatterbox_embed_tpu.parallel import make_sp_mesh, sp_generate_mel

    dec_cfg = FlowDecoderConfig(in_channels=32, out_channels=8, channels=16,
                                attention_head_dim=8, num_heads=2, n_blocks=1,
                                num_mid_blocks=1, time_embed_dim=64)
    cfm_cfg = CFMConfig(n_timesteps=2)
    params = flow_decoder.init(jax.random.PRNGKey(8), dec_cfg)
    b, t, nf = 1, 21, 8                       # 21 % 4 != 0
    mu = jnp.asarray(rng.standard_normal((b, t, nf)).astype(np.float32))
    spks = jnp.asarray(rng.standard_normal((b, nf)).astype(np.float32))
    cond = jnp.zeros((b, t, nf), jnp.float32)

    ref = cfm.generate_mel(params, mu, spks, cond, None,
                           cfm=cfm_cfg, dec_cfg=dec_cfg)
    mesh = make_sp_mesh(4)
    out = sp_generate_mel(mesh, params, mu, spks, cond, None,
                          cfm_cfg=cfm_cfg, dec_cfg=dec_cfg)
    assert out.shape == (b, t, nf)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
