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
