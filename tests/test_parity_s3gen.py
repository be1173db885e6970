"""Numerical parity of the S3Gen mel stack vs the mounted torch reference.

Each test instantiates the REAL reference module (loaded via refload) at a
reduced size with random weights, converts its state dict through
utils.weights, and asserts the JAX implementation matches. Reduced sizes keep
CPU runtime sane; the converters are size-agnostic so the name/layout mapping
exercised here is exactly the one full checkpoints go through.

Reference: models/s3gen/transformer/upsample_encoder.py:99-318 (conformer),
models/s3gen/decoder.py:100-317 (ConditionalDecoder),
models/s3gen/flow_matching.py:72-123 (solve_euler).
"""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

import refload
from chatterbox_embed_tpu.config import (ConformerConfig, FlowDecoderConfig,
                                         CFMConfig)
from chatterbox_embed_tpu.models import conformer, flow_decoder, cfm
from chatterbox_embed_tpu.utils import weights as W

# fp32 reduction-order noise between XLA and torch; structural errors are
# orders of magnitude larger.
TOL = dict(atol=3e-3, rtol=1e-2)


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


# ---------------------------------------------------------------------------
# UpsampleConformerEncoder
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def conformer_pair():
    mod = refload.load("chatterbox.models.s3gen.transformer.upsample_encoder")
    torch.manual_seed(0)
    # pre_lookahead_layer / up_layer are hardcoded to 512 channels in the
    # reference ctor, so output_size must stay 512; everything else shrinks.
    # up_embed re-reads input_size on the 512-d upsampled stream, so
    # input_size must also stay 512.
    enc = mod.UpsampleConformerEncoder(
        input_size=512, output_size=512, attention_heads=8, linear_units=96,
        num_blocks=2).eval()
    cfg = ConformerConfig(input_size=512, output_size=512, attention_heads=8,
                          linear_units=96, num_blocks=2, num_up_blocks=4)
    params = jax.tree.map(jnp.asarray,
                          W.convert_conformer(_sd(enc), "", num_blocks=2, num_up=4))
    return enc, params, cfg


@pytest.mark.parametrize("t", [12, 9])
def test_conformer_parity(conformer_pair, rng, t):
    """Exact-length rows only: the reference never masks the lookahead
    conv's right context (it hard-asserts batch=1, s3gen.py:37, so padding
    is out-of-contract there), while we zero pads for bucket invariance.
    Parity is defined on the shapes the reference actually runs."""
    enc, params, cfg = conformer_pair
    x = rng.standard_normal((1, t, 512)).astype(np.float32)
    lens = np.asarray([t], np.int32)
    with torch.no_grad():
        ref, _ = enc(torch.from_numpy(x), torch.from_numpy(lens))
    ours = conformer.forward(params, jnp.asarray(x), jnp.asarray(lens), cfg)
    np.testing.assert_allclose(np.asarray(ours)[0], ref.numpy()[0], **TOL)


# ---------------------------------------------------------------------------
# ConditionalDecoder (CFM estimator U-Net)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def decoder_pair():
    mod = refload.load("chatterbox.models.s3gen.decoder")
    torch.manual_seed(1)
    dec = mod.ConditionalDecoder(
        in_channels=32, out_channels=8, channels=[16], attention_head_dim=8,
        n_blocks=1, num_mid_blocks=2, num_heads=2, act_fn="gelu").eval()
    cfg = FlowDecoderConfig(in_channels=32, out_channels=8, channels=16,
                            attention_head_dim=8, num_heads=2, n_blocks=1,
                            num_mid_blocks=2, time_embed_dim=64)
    params = jax.tree.map(jnp.asarray,
                          W.convert_flow_decoder(_sd(dec), "", n_blocks=1, num_mid=2))
    return dec, params, cfg


def test_flow_decoder_parity(decoder_pair, rng):
    dec, params, cfg = decoder_pair
    b, t = 2, 10
    x = rng.standard_normal((b, 8, t)).astype(np.float32)
    mu = rng.standard_normal((b, 8, t)).astype(np.float32)
    spks = rng.standard_normal((b, 8)).astype(np.float32)
    cond = rng.standard_normal((b, 8, t)).astype(np.float32)
    tt = np.asarray([0.3, 0.7], np.float32)
    mask = np.ones((b, 1, t), np.float32)
    with torch.no_grad():
        ref = dec(torch.from_numpy(x), torch.from_numpy(mask),
                  torch.from_numpy(mu), torch.from_numpy(tt),
                  torch.from_numpy(spks), torch.from_numpy(cond)).numpy()
    ours = flow_decoder.forward(
        params, jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(mu.transpose(0, 2, 1)),
        jnp.asarray(tt), jnp.asarray(spks), jnp.asarray(cond.transpose(0, 2, 1)),
        mask=jnp.asarray(mask.transpose(0, 2, 1)), cfg=cfg)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 2, 1), ref, **TOL)


def test_flow_decoder_pad_mask_parity(decoder_pair, rng):
    """Padded row must match the reference given the same mask."""
    dec, params, cfg = decoder_pair
    b, t, valid = 1, 12, 7
    x = rng.standard_normal((b, 8, t)).astype(np.float32)
    mu = rng.standard_normal((b, 8, t)).astype(np.float32)
    spks = rng.standard_normal((b, 8)).astype(np.float32)
    cond = rng.standard_normal((b, 8, t)).astype(np.float32)
    tt = np.asarray([0.5], np.float32)
    mask = np.zeros((b, 1, t), np.float32)
    mask[:, :, :valid] = 1.0
    with torch.no_grad():
        ref = dec(torch.from_numpy(x), torch.from_numpy(mask),
                  torch.from_numpy(mu), torch.from_numpy(tt),
                  torch.from_numpy(spks), torch.from_numpy(cond)).numpy()
    ours = flow_decoder.forward(
        params, jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(mu.transpose(0, 2, 1)),
        jnp.asarray(tt), jnp.asarray(spks), jnp.asarray(cond.transpose(0, 2, 1)),
        mask=jnp.asarray(mask.transpose(0, 2, 1)), cfg=cfg)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 2, 1)[..., :valid],
                               ref[..., :valid], **TOL)


# ---------------------------------------------------------------------------
# solve_euler (CFG Euler ODE, 10 steps, cosine schedule)
# ---------------------------------------------------------------------------

def test_solve_euler_parity(rng):
    """Full 10-step CFG ODE with one shared noise buffer injected into both.
    The reference solver hardcodes 80 mel bins / 80-d spks in its CFG
    buffers (flow_matching.py:95-100), so feats stay 80 and only the
    estimator shrinks."""
    dec_mod = refload.load("chatterbox.models.s3gen.decoder")
    fm_mod = refload.load("chatterbox.models.s3gen.flow_matching")
    torch.manual_seed(2)
    est = dec_mod.ConditionalDecoder(
        in_channels=320, out_channels=80, channels=[16], attention_head_dim=8,
        n_blocks=1, num_mid_blocks=1, num_heads=2, act_fn="gelu").eval()
    ref_cfm = fm_mod.CausalConditionalCFM(estimator=est)

    dec_cfg = FlowDecoderConfig(in_channels=320, out_channels=80, channels=16,
                                attention_head_dim=8, num_heads=2, n_blocks=1,
                                num_mid_blocks=1, time_embed_dim=64)
    params = jax.tree.map(jnp.asarray,
                          W.convert_flow_decoder(_sd(est), "", n_blocks=1, num_mid=1))

    b, t = 1, 14
    mu = rng.standard_normal((b, 80, t)).astype(np.float32)
    spks = rng.standard_normal((b, 80)).astype(np.float32)
    cond = rng.standard_normal((b, 80, t)).astype(np.float32)
    mask = np.ones((b, 1, t), np.float32)
    with torch.no_grad():
        ref_mel, _ = ref_cfm(torch.from_numpy(mu.copy()), torch.from_numpy(mask),
                             n_timesteps=10, spks=torch.from_numpy(spks),
                             cond=torch.from_numpy(cond))
    z = ref_cfm.rand_noise[:, :, :t].numpy()  # shared noise buffer

    ours = cfm.solve_euler(
        params, jnp.asarray(z.transpose(0, 2, 1)), jnp.asarray(mu.transpose(0, 2, 1)),
        jnp.asarray(spks), jnp.asarray(cond.transpose(0, 2, 1)),
        mask=jnp.asarray(mask.transpose(0, 2, 1)),
        cfm=CFMConfig(), dec_cfg=dec_cfg)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 2, 1),
                               ref_mel.numpy(), atol=5e-3, rtol=2e-2)
