"""Pallas flash-decode kernel vs the jnp reference (interpreter mode on CPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from chatterbox_embed_tpu.kernels import flash_decode as fd


@pytest.mark.parametrize("pos", [0, 1, 255, 256, 300, 511])
def test_decode_attention_matches_reference(rng, pos):
    b, l, h, d = 2, 512, 4, 64
    q = jnp.asarray(rng.standard_normal((b, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((l, b, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((l, b, h, d)).astype(np.float32))
    ref = fd.decode_attention_reference(q, k, v, jnp.int32(pos))
    out = fd.decode_attention(q, k, v, jnp.int32(pos), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("start,pos", [(3, 40), (10, 300), (256, 400)])
def test_decode_attention_start_offset(rng, start, pos):
    b, l, h, d = 2, 512, 4, 64
    q = jnp.asarray(rng.standard_normal((b, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((l, b, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((l, b, h, d)).astype(np.float32))
    ref = fd.decode_attention_reference(q, k, v, jnp.int32(pos), start)
    out = fd.decode_attention(q, k, v, jnp.int32(pos), jnp.int32(start), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_decode_attention_multi_row_grid(rng):
    """Batched rows run as a grid of row-block programs, each DMA-walking its
    own column stripe of the (L, F) cache — results must match the reference
    for every row (b=16, fp32 -> 2 programs of 8 rows under the VMEM cap)."""
    b, l, h, d = 16, 512, 4, 64
    assert fd._row_block(b, h, d, 4) < b, "test must exercise a multi-program grid"
    q = jnp.asarray(rng.standard_normal((b, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((l, b, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((l, b, h, d)).astype(np.float32))
    for start, pos in ((0, 77), (64, 300)):
        ref = fd.decode_attention_reference(q, k, v, jnp.int32(pos), start)
        out = fd.decode_attention(q, k, v, jnp.int32(pos), jnp.int32(start),
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)


def test_decode_attention_per_row_hole(rng):
    """Ragged right-padded text: each row's dead [lo, hi) key range must be
    excluded exactly like the XLA path's key_valid mask."""
    b, l, h, d = 4, 512, 4, 64
    q = jnp.asarray(rng.standard_normal((b, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((l, b, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((l, b, h, d)).astype(np.float32))
    # rows 0..3: no hole, short hole, hole spanning a chunk boundary, wide
    hole = jnp.asarray([[0, 0], [30, 40], [250, 270], [40, 200]], jnp.int32)
    pos, start = 310, 8
    ref = fd.decode_attention_reference(q, k, v, jnp.int32(pos), start, hole)
    out = fd.decode_attention(q, k, v, jnp.int32(pos), jnp.int32(start),
                              hole=hole, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
    # a hole must differ from no-hole (the mask actually bites)
    out_nohole = fd.decode_attention(q, k, v, jnp.int32(pos), jnp.int32(start),
                                     interpret=True)
    assert np.abs(np.asarray(out) - np.asarray(out_nohole))[1:].max() > 1e-4
