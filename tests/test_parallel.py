"""Multi-chip paths on the 8-virtual-CPU-device mesh: dp-sharded batched
inference and dp x tp training steps."""
import numpy as np
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
