"""Training steps actually learn: loss decreases over a few steps on a tiny
overfit batch (single device + sharded variants)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from chatterbox_embed_tpu.config import T3Config, LlamaConfig, CFMConfig, FlowDecoderConfig
from chatterbox_embed_tpu.models import t3, flow_decoder
from chatterbox_embed_tpu.parallel import make_mesh
from chatterbox_embed_tpu.training import (make_t3_train_step, make_flow_train_step,
                                           init_t3_train_state, init_flow_train_state)
from chatterbox_embed_tpu.training.train_step import shard_t3_state

TINY = T3Config(
    llama=LlamaConfig(hidden_size=32, intermediate_size=64, num_layers=2,
                      num_heads=4, num_kv_heads=4, head_dim=8),
    text_tokens_dict_size=50, speech_tokens_dict_size=40,
    start_speech_token=36, stop_speech_token=37,
    max_text_tokens=32, max_speech_tokens=64,
    speaker_embed_size=8, speech_cond_prompt_len=4)


def _t3_batch(rng, b=4):
    return {
        "speaker_emb": rng.standard_normal((b, 8)).astype(np.float32),
        "cond_prompt_tokens": rng.integers(0, 36, (b, 4)).astype(np.int32),
        "emotion_adv": np.full((b, 1, 1), 0.5, np.float32),
        "text_tokens": rng.integers(0, 50, (b, 8)).astype(np.int32),
        "text_lens": np.full((b,), 8, np.int32),
        "speech_tokens": rng.integers(0, 36, (b, 12)).astype(np.int32),
        "speech_lens": np.full((b,), 12, np.int32),
    }


@pytest.mark.slow
def test_t3_training_loss_decreases(rng):
    mesh = make_mesh(4)
    params = t3.init(jax.random.PRNGKey(0), TINY)
    state = shard_t3_state(init_t3_train_state(params, lr=3e-3), mesh, lr=3e-3)
    step_fn, shardings = make_t3_train_step(mesh, TINY, lr=3e-3, remat=True)
    batch = {k: jax.device_put(v, shardings[k]) for k, v in _t3_batch(rng).items()}
    losses = []
    with mesh:
        for _ in range(8):
            state, metrics = step_fn(state, batch)
            losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


@pytest.mark.slow
def test_flow_training_loss_decreases(rng):
    mesh = make_mesh(4)
    dec = FlowDecoderConfig(in_channels=32, out_channels=8, channels=16,
                            attention_head_dim=8, num_heads=2, n_blocks=1,
                            num_mid_blocks=1, time_embed_dim=64)
    params = flow_decoder.init(jax.random.PRNGKey(0), dec)
    state = init_flow_train_state(params, lr=3e-3)
    step_fn, shardings = make_flow_train_step(mesh, CFMConfig(), dec, lr=3e-3)
    batch = {
        "mel": rng.standard_normal((4, 16, 8)).astype(np.float32),
        "mu": rng.standard_normal((4, 16, 8)).astype(np.float32),
        "spks": rng.standard_normal((4, 8)).astype(np.float32),
        "cond": np.zeros((4, 16, 8), np.float32),
        "mask": np.ones((4, 16, 1), np.float32),
    }
    batch = {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}
    losses = []
    with mesh:
        for i in range(10):
            state, metrics = step_fn(state, jax.random.PRNGKey(i % 2), batch)
            losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # CFM loss is noisy (random t); compare averages of halves with fixed keys
    assert np.mean(losses[5:]) < np.mean(losses[:5]) * 1.05
