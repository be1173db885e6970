"""Pallas flash-decode kernel vs the jnp reference (interpreter mode on CPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from chatterbox_embed_tpu.kernels import flash_decode as fd
from chatterbox_embed_tpu.models import conformer as cf


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


def test_decode_attention_multi_row_blocks(rng):
    """Batched rows run as ONE program with the feature dim processed in
    static sub-blocks — results must match the reference for every row
    (b=32 rows -> F=8192 -> 2 feature blocks)."""
    b, l, h, d = 32, 512, 4, 64
    assert fd._feature_block(b * h * d, d) < b * h * d, \
        "test must exercise the multi-block unroll"
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


def test_decode_attention_stacked_cache_with_deferred_row(rng):
    """Round-4 interface: the kernel DMAs layer slabs straight from the
    STACKED (n_layers, Lc, B, H, D) cache (no per-layer slice copy) and
    folds the deferred current-token k/v row as a final height-1 chunk.
    Must equal the reference run on that layer's slab WITH the row already
    inserted at cache_pos."""
    n_layers, b, l, h, d = 3, 2, 512, 4, 64
    q = jnp.asarray(rng.standard_normal((b, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((n_layers, l, b, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((n_layers, l, b, h, d)).astype(np.float32))
    k_cur = jnp.asarray(rng.standard_normal((b, h, d)).astype(np.float32))
    v_cur = jnp.asarray(rng.standard_normal((b, h, d)).astype(np.float32))
    pos, start = 300, 8
    for li in range(n_layers):
        k_ins = k[li].at[pos].set(k_cur)
        v_ins = v[li].at[pos].set(v_cur)
        ref = fd.decode_attention_reference(q, k_ins, v_ins, jnp.int32(pos), start)
        out = fd.decode_attention(q, k, v, jnp.int32(pos), jnp.int32(start),
                                  layer=jnp.int32(li), k_cur=k_cur, v_cur=v_cur,
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)
    # the layer index must actually select different slabs
    o0 = fd.decode_attention(q, k, v, jnp.int32(pos), jnp.int32(start),
                             layer=jnp.int32(0), k_cur=k_cur, v_cur=v_cur,
                             interpret=True)
    o2 = fd.decode_attention(q, k, v, jnp.int32(pos), jnp.int32(start),
                             layer=jnp.int32(2), k_cur=k_cur, v_cur=v_cur,
                             interpret=True)
    assert np.abs(np.asarray(o0) - np.asarray(o2)).max() > 1e-4


def test_decode_attention_stacked_cache_eager(rng):
    """Stacked entry WITHOUT the deferred row (CHATTERBOX_FLASH_STACKED
    eager experiment): the current token is already inserted at cache_pos,
    so the kernel walks [start, cache_pos] inclusive from the stacked
    buffer with a traced layer index. Must equal the reference on the
    selected layer's slab."""
    n_layers, b, l, h, d = 3, 2, 512, 4, 64
    q = jnp.asarray(rng.standard_normal((b, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((n_layers, l, b, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((n_layers, l, b, h, d)).astype(np.float32))
    pos, start = 300, 8
    for li in range(n_layers):
        ref = fd.decode_attention_reference(q, k[li], v[li], jnp.int32(pos), start)
        out = fd.decode_attention(q, k, v, jnp.int32(pos), jnp.int32(start),
                                  layer=jnp.int32(li), interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)


def test_decode_attention_deferred_first_step(rng):
    """cache_pos == start + 1 edge: only one history slot plus the deferred
    current row (the first decoded token after prefill)."""
    b, l, h, d = 2, 256, 4, 64
    q = jnp.asarray(rng.standard_normal((b, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((l, b, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((l, b, h, d)).astype(np.float32))
    k_cur = jnp.asarray(rng.standard_normal((b, h, d)).astype(np.float32))
    v_cur = jnp.asarray(rng.standard_normal((b, h, d)).astype(np.float32))
    pos, start = 9, 8
    k_ins = k.at[pos].set(k_cur)
    v_ins = v.at[pos].set(v_cur)
    ref = fd.decode_attention_reference(q, k_ins, v_ins, jnp.int32(pos), start)
    out = fd.decode_attention(q, k, v, jnp.int32(pos), jnp.int32(start),
                              layer=0, k_cur=k_cur, v_cur=v_cur, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_rel_factored_bd_matches_gathered(rng):
    """The factored Transformer-XL bd (A C^T + B S^T, conformer._rel_factors)
    must equal the reference gathered form bd[i,j] = qv[i]·pe_proj[T-1-i+j]
    (the torch formulation's materialise+rel-shift)."""
    t, d, h = 23, 32, 4
    dk = d // h
    qv = rng.standard_normal((2, t, h, dk)).astype(np.float32)
    w = rng.standard_normal((d, d)).astype(np.float32)
    p = {"pos": {"w": w}}
    pe = cf._espnet_rel_pe(t, d)                  # (2t-1, d)
    pe_proj = (pe @ w).reshape(-1, h, dk)
    bd_ref = np.einsum("bihc,phc->bhip", qv, pe_proj)
    # rel shift: bd[i, j] = bd_full[i, (t-1) - i + j]
    bd_g = np.zeros((2, h, t, t), np.float32)
    for i in range(t):
        bd_g[:, :, i, :] = bd_ref[:, :, i, (t - 1) - i: (2 * t - 1) - i]
    sin_t, cos_t = cf._rel_trig(t, d)
    a, bb = cf._rel_factors(p, jnp.asarray(qv), h, sin_t, cos_t)
    bd_f = (np.einsum("bihm,jm->bhij", np.asarray(a), cos_t)
            + np.einsum("bihm,jm->bhij", np.asarray(bb), sin_t))
    np.testing.assert_allclose(bd_f, bd_g, rtol=1e-4, atol=1e-4)


def test_rel_attention_kernel_matches_xla(rng, monkeypatch):
    """conformer.forward with the Pallas rel-attention kernel (interpreter on
    CPU) must match the XLA factored path, including ragged pad masks."""
    from chatterbox_embed_tpu.config import ConformerConfig
    cfg = ConformerConfig(input_size=32, output_size=32, attention_heads=4,
                          linear_units=64, num_blocks=1, num_up_blocks=1)
    params = cf.init(jax.random.PRNGKey(3), cfg)
    x = jnp.asarray(rng.standard_normal((4, 11, 32)).astype(np.float32))
    lens = jnp.asarray([11, 7, 9, 4])
    monkeypatch.setenv("CHATTERBOX_PALLAS", "0")
    xla = np.asarray(cf.forward(params, x, lens, cfg))
    monkeypatch.setenv("CHATTERBOX_PALLAS", "1")
    ker = np.asarray(cf.forward(params, x, lens, cfg))
    # only compare valid positions (invalid queries differ by design)
    for i, n in enumerate([11, 7, 9, 4]):
        np.testing.assert_allclose(ker[i, : 2 * n], xla[i, : 2 * n],
                                   rtol=2e-4, atol=2e-5)
