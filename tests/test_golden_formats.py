"""Golden on-disk format tests against the reference's checked-in fixture
(SURVEY.md §4: audio_test/reference_voice_clone.npy is the format contract)."""
import os

import numpy as np
import pytest

GOLDEN = "/root/reference/audio_test/reference_voice_clone.npy"


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="reference tree not mounted")
def test_reference_voice_clone_fixture_loads():
    """Our voice-clone reader must accept the reference's real artifact."""
    emb = np.load(GOLDEN)
    assert emb.shape == (1, 192) and emb.dtype == np.float32
    # sanity: CAMPPlus embeddings are zero-ish mean, unit-ish std
    assert abs(float(emb.mean())) < 0.5
    assert 0.5 < float(emb.std()) < 2.0


def test_save_voice_clone_format_matches_fixture(tmp_path, rng):
    """save_voice_clone must write the exact same format: raw (1, 192) f32."""
    import jax
    from chatterbox_embed_tpu.models import s3gen as s3gen_mod
    from chatterbox_embed_tpu.models import xvector
    from chatterbox_embed_tpu.config import S3GenConfig

    params = {"speaker_encoder": xvector.init(jax.random.PRNGKey(0))}
    wav = (rng.standard_normal(16_000) * 0.1).astype(np.float32)
    path = str(tmp_path / "clone.npy")
    s3gen_mod.save_voice_clone(params, wav, 16_000, path, S3GenConfig())
    ours = np.load(path)
    if os.path.exists(GOLDEN):
        ref = np.load(GOLDEN)
        assert ours.shape == ref.shape and ours.dtype == ref.dtype
    else:
        assert ours.shape == (1, 192) and ours.dtype == np.float32


def test_conditionals_pt_roundtrip(tmp_path, rng):
    """conds.pt save/load via the torch container format (conditionals.py)."""
    import jax.numpy as jnp
    from chatterbox_embed_tpu.conditionals import Conditionals
    from chatterbox_embed_tpu.models.t3 import T3Cond

    conds = Conditionals(
        T3Cond(speaker_emb=jnp.asarray(rng.standard_normal((1, 256)).astype(np.float32)),
               cond_prompt_speech_tokens=jnp.asarray(rng.integers(0, 6561, (1, 150)).astype(np.int32)),
               emotion_adv=0.5),
        gen=dict(prompt_token=rng.integers(0, 6561, (1, 250)),
                 prompt_token_len=np.array([250]),
                 prompt_feat=rng.standard_normal((1, 500, 80)).astype(np.float32),
                 prompt_feat_len=None,
                 embedding=rng.standard_normal((1, 192)).astype(np.float32)),
    )
    path = str(tmp_path / "conds.pt")
    conds.save(path)
    back = Conditionals.load(path)
    np.testing.assert_array_equal(np.asarray(conds.t3.speaker_emb),
                                  np.asarray(back.t3.speaker_emb))
    np.testing.assert_array_equal(np.asarray(conds.t3.cond_prompt_speech_tokens),
                                  np.asarray(back.t3.cond_prompt_speech_tokens))
    assert back.t3.emotion_adv == 0.5
    np.testing.assert_array_equal(conds.gen["prompt_feat"], np.asarray(back.gen["prompt_feat"]))
    np.testing.assert_array_equal(conds.gen["embedding"], np.asarray(back.gen["embedding"]))
