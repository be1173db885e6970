"""Speaker-identity path: VoiceEncoder (256-d) and CAMPPlus (192-d)."""
import numpy as np
import jax
import jax.numpy as jnp

from chatterbox_embed_tpu.config import VoiceEncConfig, CAMPPlusConfig
from chatterbox_embed_tpu.models import voice_encoder as VE
from chatterbox_embed_tpu.models import xvector as XV


def test_voice_encoder_embedding(rng):
    params = VE.init(jax.random.PRNGKey(0))
    wav = (rng.standard_normal(3 * 16_000) * 0.1).astype(np.float32)
    emb = VE.embeds_from_wavs(params, [wav], 16_000)
    assert emb.shape == (1, 256)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)
    assert (emb >= 0).all()  # final relu


def test_voice_encoder_partial_math():
    cfg = VoiceEncConfig()
    # rate=1.3 -> frame_step = round((16000/1.3)/160) = 77
    assert VE._frame_step(cfg, rate=1.3) == 77
    n, target = VE._num_wins(300, 77, 0.8, cfg)
    assert target == 160 + 77 * (n - 1)


def test_trim_silence():
    wav = np.zeros(16_000, np.float32)
    wav[6000:9000] = np.sin(np.arange(3000) * 0.3).astype(np.float32)
    trimmed = VE.trim_silence(wav, top_db=20)
    assert len(trimmed) < len(wav)
    assert np.abs(trimmed).max() == np.abs(wav).max()


def test_campplus_embedding(rng):
    params = XV.init(jax.random.PRNGKey(0))
    wav = (rng.standard_normal((1, 2 * 16_000)) * 0.1).astype(np.float32)
    emb = XV.inference(params, jnp.asarray(wav))
    assert emb.shape == (1, 192)
    assert np.isfinite(np.asarray(emb)).all()
    # deterministic
    emb2 = XV.inference(params, jnp.asarray(wav))
    np.testing.assert_array_equal(np.asarray(emb), np.asarray(emb2))


def test_campplus_batch_consistency(rng):
    # same utterance duplicated in a batch must produce identical embeddings
    params = XV.init(jax.random.PRNGKey(1))
    wav = (rng.standard_normal(16_000) * 0.1).astype(np.float32)
    batch = jnp.asarray(np.stack([wav, wav]))
    emb = np.asarray(XV.inference(params, batch))
    np.testing.assert_allclose(emb[0], emb[1], atol=1e-5)
