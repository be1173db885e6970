"""Layer-toolkit parity vs torch: these primitives carry every converted
checkpoint, so they must match torch's semantics exactly."""
import numpy as np
import torch
import jax.numpy as jnp

from chatterbox_embed_tpu.models import layers as L


def _t(x):
    return torch.from_numpy(np.asarray(x))


def test_linear_matches_torch(rng):
    x = rng.standard_normal((2, 5, 16)).astype(np.float32)
    w = rng.standard_normal((16, 8)).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    ours = L.linear({"w": jnp.asarray(w), "b": jnp.asarray(b)}, jnp.asarray(x))
    ref = torch.nn.functional.linear(_t(x), _t(w.T), _t(b))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_conv1d_matches_torch(rng):
    x = rng.standard_normal((2, 20, 6)).astype(np.float32)
    w = rng.standard_normal((5, 6, 8)).astype(np.float32)   # (width, in, out)
    b = rng.standard_normal(8).astype(np.float32)
    for stride, pad, dil in [(1, 2, 1), (2, 2, 1), (1, 4, 2)]:
        ours = L.conv1d({"w": jnp.asarray(w), "b": jnp.asarray(b)}, jnp.asarray(x),
                        stride=stride, padding=pad, dilation=dil)
        # torch: (B, C, T), weight (out, in, width)
        ref = torch.nn.functional.conv1d(_t(x).transpose(1, 2), _t(w.transpose(2, 1, 0)),
                                         _t(b), stride=stride, padding=pad, dilation=dil)
        np.testing.assert_allclose(np.asarray(ours), ref.transpose(1, 2).numpy(),
                                   atol=1e-4, rtol=1e-4)


def test_conv_transpose1d_matches_torch(rng):
    x = rng.standard_normal((1, 12, 4)).astype(np.float32)
    for width, stride, pad in [(16, 8, 4), (11, 5, 3), (4, 2, 1)]:
        w = rng.standard_normal((width, 6, 4)).astype(np.float32)  # (width, out, in)
        b = rng.standard_normal(6).astype(np.float32)
        ours = L.conv_transpose1d({"w": jnp.asarray(w), "b": jnp.asarray(b)},
                                  jnp.asarray(x), stride=stride, padding=pad)
        # torch weight layout: (in, out, width)
        ref = torch.nn.functional.conv_transpose1d(
            _t(x).transpose(1, 2), _t(w.transpose(2, 1, 0)), _t(b),
            stride=stride, padding=pad)
        np.testing.assert_allclose(np.asarray(ours), ref.transpose(1, 2).numpy(),
                                   atol=1e-4, rtol=1e-4)


def test_conv2d_matches_torch(rng):
    x = rng.standard_normal((2, 10, 12, 3)).astype(np.float32)
    w = rng.standard_normal((3, 3, 3, 5)).astype(np.float32)  # (kh, kw, in, out)
    ours = L.conv2d({"w": jnp.asarray(w)}, jnp.asarray(x), stride=(2, 1), padding=1)
    ref = torch.nn.functional.conv2d(_t(x).permute(0, 3, 1, 2), _t(w.transpose(3, 2, 0, 1)),
                                     stride=(2, 1), padding=1)
    np.testing.assert_allclose(np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(),
                               atol=1e-4, rtol=1e-4)


def test_layer_norm_matches_torch(rng):
    x = rng.standard_normal((3, 7, 16)).astype(np.float32)
    g = rng.standard_normal(16).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)
    ours = L.layer_norm({"scale": jnp.asarray(g), "bias": jnp.asarray(b)}, jnp.asarray(x), eps=1e-5)
    ref = torch.nn.functional.layer_norm(_t(x), (16,), _t(g), _t(b), eps=1e-5)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_group_norm_matches_torch(rng):
    x = rng.standard_normal((2, 9, 16)).astype(np.float32)  # (B, T, C)
    g = rng.standard_normal(16).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)
    ours = L.group_norm({"scale": jnp.asarray(g), "bias": jnp.asarray(b)}, jnp.asarray(x),
                        num_groups=8, eps=1e-5)
    ref = torch.nn.functional.group_norm(_t(x).transpose(1, 2), 8, _t(g), _t(b), eps=1e-5)
    np.testing.assert_allclose(np.asarray(ours), ref.transpose(1, 2).numpy(), atol=1e-5)


def test_batch_norm_inference_matches_torch(rng):
    x = rng.standard_normal((2, 11, 8)).astype(np.float32)
    p = {"scale": jnp.asarray(rng.standard_normal(8).astype(np.float32)),
         "bias": jnp.asarray(rng.standard_normal(8).astype(np.float32)),
         "mean": jnp.asarray(rng.standard_normal(8).astype(np.float32)),
         "var": jnp.asarray(rng.random(8).astype(np.float32) + 0.5)}
    ours = L.batch_norm(p, jnp.asarray(x))
    ref = torch.nn.functional.batch_norm(
        _t(x).transpose(1, 2), _t(np.asarray(p["mean"])), _t(np.asarray(p["var"])),
        _t(np.asarray(p["scale"])), _t(np.asarray(p["bias"])), training=False, eps=1e-5)
    np.testing.assert_allclose(np.asarray(ours), ref.transpose(1, 2).numpy(), atol=1e-5)


def test_mha_matches_torch_sdpa(rng):
    b, t, h, d = 2, 6, 4, 16
    q = rng.standard_normal((b, t, h, d)).astype(np.float32)
    k = rng.standard_normal((b, t, h, d)).astype(np.float32)
    v = rng.standard_normal((b, t, h, d)).astype(np.float32)
    ours = L.mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    ref = torch.nn.functional.scaled_dot_product_attention(
        _t(q).permute(0, 2, 1, 3), _t(k).permute(0, 2, 1, 3), _t(v).permute(0, 2, 1, 3))
    np.testing.assert_allclose(np.asarray(ours), ref.permute(0, 2, 1, 3).numpy(), atol=1e-5)


def test_lstm_matches_torch(rng):
    from chatterbox_embed_tpu.models import voice_encoder as VE
    torch.manual_seed(0)
    ref_lstm = torch.nn.LSTM(40, 32, num_layers=3, batch_first=True)
    params = {"lstm": [], "proj": None}
    for i in range(3):
        params["lstm"].append({
            "wi": jnp.asarray(getattr(ref_lstm, f"weight_ih_l{i}").detach().numpy().T),
            "wh": jnp.asarray(getattr(ref_lstm, f"weight_hh_l{i}").detach().numpy().T),
            "bi": jnp.asarray(getattr(ref_lstm, f"bias_ih_l{i}").detach().numpy()),
            "bh": jnp.asarray(getattr(ref_lstm, f"bias_hh_l{i}").detach().numpy()),
        })
    x = rng.standard_normal((3, 20, 40)).astype(np.float32)
    h = jnp.asarray(x)
    for layer in params["lstm"]:
        h, h_last = VE._lstm_layer(layer, h)
    with torch.no_grad():
        out, (hn, cn) = ref_lstm(_t(x))
    np.testing.assert_allclose(np.asarray(h), out.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_last), hn[-1].numpy(), atol=1e-5)


def test_mha_chunked_matches_mha(rng):
    from chatterbox_embed_tpu.models import layers as L2
    import jax.numpy as jnp2
    b, t, h, d = 2, 70, 4, 16
    q = jnp2.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    k = jnp2.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    v = jnp2.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    mask = jnp2.asarray(rng.random((b, 1, 1, t)) > 0.2)
    ref = L2.mha(q, k, v, mask=mask)
    out = L2.mha_chunked(q, k, v, mask=mask, q_chunk=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_int8_linear_close_to_fp(rng):
    from chatterbox_embed_tpu.models import layers as L2
    import jax.numpy as jnp2
    p = {"w": rng.standard_normal((64, 32)).astype(np.float32),
         "b": rng.standard_normal(32).astype(np.float32)}
    x = jnp2.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    ref = np.asarray(L2.linear(p, x))
    q = L2.quantize_linear(p)
    assert q["w_q"].dtype == np.int8
    out = np.asarray(L2.linear(q, x))
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.03, err


def test_flash_block_choice():
    """Tile selection for the flash kernels: block_q divides the padded T,
    block_b divides the batch and the FULL scoped-VMEM footprint (logits +
    double-buffered k/v tiles + q/out + segment ids) fits the budget."""
    from chatterbox_embed_tpu.models.layers import (
        _FLASH_VMEM_BUDGET, _flash_block_choice, _flash_vmem_footprint)
    for b in (1, 2, 4, 8, 16, 32):
        for tp in (128, 384, 640, 768, 1280, 1152, 2048, 2432, 4096):
            for has_ab in (False, True):
                bq, bb = _flash_block_choice(b, tp, has_ab)
                assert tp % bq == 0 and bq <= 1024 and bq % 128 == 0
                assert b % bb == 0
                assert (_flash_vmem_footprint(bb, bq, tp, has_ab, 64, 2)
                        <= _FLASH_VMEM_BUDGET) or bb == 1
    # whole row, batch rows bounded by the VMEM budget
    assert _flash_block_choice(16, 640, False) == (640, 4)
    # longer rows: block_q capped at 1024 falls to the largest divisor,
    # and the ab tile halves the batch block budget
    bq, bb = _flash_block_choice(16, 1280, True)
    assert bq == 640 and bb in (1, 2)
    # long T with ab bias: even a SINGLE program's q-tile must fit the VMEM
    # budget — block_q itself shrinks (1024x2048 fp32 x2 would be ~16 MB)
    bq, bb = _flash_block_choice(2, 2048, True)
    assert bq == 512
    # without ab the same shape keeps the larger tile
    bq_no_ab, _ = _flash_block_choice(2, 2048, False)
    assert bq_no_ab == 1024
    # q4ac regression: the continuous-serving OOM shape (b=8 rows, T=2432,
    # d=64). The old logits-only model picked block_b=8 -> 21 MB scoped
    # allocation vs the 16 MB limit; the footprint model must stay under
    # budget at whatever it picks, and NOT collapse all the way to bb=1.
    bq, bb = _flash_block_choice(8, 2432, False)
    assert bq == 128 and bb == 4  # 2432 = 19*128, 19 prime -> only 128 divides
    assert _flash_vmem_footprint(bb, bq, 2432, False, 64, 2) <= _FLASH_VMEM_BUDGET
    assert _flash_vmem_footprint(8, bq, 2432, False, 64, 2) > (16 << 20)
    # conformer headline configs keep their measured-good tiles (rows=16,
    # T=768 upsampled with the ab bias rode block_b=2 in the -46% bench)
    assert _flash_block_choice(16, 768, True) == (768, 2)
    assert _flash_block_choice(32, 896, False) == (896, 2)
