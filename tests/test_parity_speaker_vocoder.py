"""HiFT-GAN / CAMPPlus / VoiceEncoder parity vs the mounted torch reference.

Reference: models/s3gen/hifigan.py:286-474 (vocoder; the stochastic sine
source is generated once and injected into BOTH implementations),
models/s3gen/f0_predictor.py:19-55, models/s3gen/xvector.py:340-428
(CAMPPlus minus the torchaudio fbank front-end — features are precomputed),
models/voice_encoder/voice_encoder.py:119-160 (3-layer LSTM + proj).
"""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

import refload
from chatterbox_embed_tpu.config import HiFTConfig, CAMPPlusConfig, VoiceEncConfig
from chatterbox_embed_tpu.models import hifigan, xvector, voice_encoder
from chatterbox_embed_tpu.utils import weights as W

TOL = dict(atol=3e-3, rtol=1e-2)


def _sd(model, prefix=""):
    return {prefix + k: v.detach().numpy() for k, v in model.state_dict().items()}


# ---------------------------------------------------------------------------
# HiFT-GAN
# ---------------------------------------------------------------------------

TINY_HIFT = HiFTConfig(in_channels=16, base_channels=32, f0_cond_channels=24)


@pytest.fixture(scope="module")
def hift_pair():
    hmod = refload.load("chatterbox.models.s3gen.hifigan")
    fmod = refload.load("chatterbox.models.s3gen.f0_predictor")
    torch.manual_seed(0)
    f0p = fmod.ConvRNNF0Predictor(num_class=1, in_channels=16, cond_channels=24)
    gen = hmod.HiFTGenerator(
        in_channels=16, base_channels=32, nb_harmonics=8, sampling_rate=24000,
        upsample_rates=[8, 5, 3], upsample_kernel_sizes=[16, 11, 7],
        istft_params={"n_fft": 16, "hop_len": 4},
        source_resblock_kernel_sizes=[7, 7, 11],
        source_resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        f0_predictor=f0p).eval()
    params = jax.tree.map(jnp.asarray, W.convert_hift(_sd(gen), "", cfg=TINY_HIFT))
    return gen, params


def test_f0_predictor_parity(hift_pair, rng):
    gen, params = hift_pair
    mel = rng.standard_normal((1, 16, 20)).astype(np.float32)
    with torch.no_grad():
        ref = gen.f0_predictor(torch.from_numpy(mel)).numpy()
    ours = hifigan.f0_predict(params["f0_predictor"],
                              jnp.asarray(mel.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(ours), ref, **TOL)


def test_hift_decode_parity(hift_pair, rng):
    """Shared excitation source injected into both decode paths."""
    gen, params = hift_pair
    t = 12
    mel = rng.standard_normal((1, 16, t)).astype(np.float32)
    source = (0.1 * rng.standard_normal((1, 1, t * 480))).astype(np.float32)
    with torch.no_grad():
        ref = gen.decode(torch.from_numpy(mel), torch.from_numpy(source)).numpy()
    ours = hifigan.decode(params, jnp.asarray(mel.transpose(0, 2, 1)),
                          jnp.asarray(source[:, 0]), TINY_HIFT)
    assert np.asarray(ours).shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-3, rtol=2e-2)


# ---------------------------------------------------------------------------
# CAMPPlus (minus the torchaudio-Kaldi fbank front-end)
# ---------------------------------------------------------------------------

def test_campplus_parity(rng):
    xv = refload.load("chatterbox.models.s3gen.xvector")
    torch.manual_seed(1)
    ref = xv.CAMPPlus(feat_dim=16, embedding_size=12, growth_rate=4, bn_size=2,
                      init_channels=16).eval()
    cfg = CAMPPlusConfig(feat_dim=16, embedding_size=12, growth_rate=4,
                         bn_size=2, init_channels=16)
    params = jax.tree.map(jnp.asarray, W.convert_campplus(_sd(ref), "", cfg=cfg))
    feats = rng.standard_normal((2, 60, 16)).astype(np.float32)
    with torch.no_grad():
        ref_emb = ref(torch.from_numpy(feats)).numpy()
    ours = xvector.forward(params, jnp.asarray(feats), cfg)
    np.testing.assert_allclose(np.asarray(ours), ref_emb, **TOL)


# ---------------------------------------------------------------------------
# VoiceEncoder (full reference size — it is small)
# ---------------------------------------------------------------------------

def test_voice_encoder_parity(rng):
    vmod = refload.load("chatterbox.models.voice_encoder.voice_encoder")
    torch.manual_seed(2)
    ref = vmod.VoiceEncoder().eval()
    params = jax.tree.map(jnp.asarray, W.convert_voice_encoder(_sd(ref)))
    mels = (0.5 * np.abs(rng.standard_normal((3, 160, 40)))).astype(np.float32)
    with torch.no_grad():
        ref_emb = ref(torch.from_numpy(mels)).numpy()
    ours = voice_encoder.forward(params, jnp.asarray(mels), VoiceEncConfig())
    np.testing.assert_allclose(np.asarray(ours), ref_emb, **TOL)
