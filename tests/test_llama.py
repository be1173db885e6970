"""Llama backbone parity vs HF transformers (the exact library the reference
runs, t3.py:10,45-46) — random weights, converted through utils.weights."""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from chatterbox_embed_tpu.config import LlamaConfig
from chatterbox_embed_tpu.models import llama
from chatterbox_embed_tpu.utils import weights as W

SMALL = LlamaConfig(hidden_size=64, intermediate_size=128, num_layers=2,
                    num_heads=4, num_kv_heads=4, head_dim=16)


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import LlamaModel, LlamaConfig as HFConfig
    hf_cfg = HFConfig(
        vocab_size=8, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, head_dim=16,
        max_position_embeddings=131072, rms_norm_eps=1e-5, rope_theta=500000.0,
        attention_bias=False, mlp_bias=False, tie_word_embeddings=False,
        rope_scaling=dict(factor=8.0, high_freq_factor=4.0, low_freq_factor=1.0,
                          original_max_position_embeddings=8192, rope_type="llama3"),
        attn_implementation="sdpa",
    )
    torch.manual_seed(0)
    model = LlamaModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = jax.tree.map(jnp.asarray, W.convert_llama(sd, 2))
    return model, params


def test_forward_matches_hf(hf_pair, rng):
    model, params = hf_pair
    x = rng.standard_normal((2, 10, 64)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = model(inputs_embeds=torch.from_numpy(x)).last_hidden_state.numpy()
    pos = jnp.broadcast_to(jnp.arange(10)[None], (2, 10))
    ours, _ = llama.forward(params, jnp.asarray(x), pos, cfg=SMALL)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-3)


def test_kv_cache_decode_matches_full_forward(hf_pair, rng):
    """Prefill + step-by-step decode == one full forward (self-consistency)."""
    _, params = hf_pair
    t_total, t_prefill = 12, 8
    x = jnp.asarray(rng.standard_normal((1, t_total, 64)).astype(np.float32) * 0.1)
    pos_full = jnp.arange(t_total)[None]
    full, _ = llama.forward(params, x, pos_full, cfg=SMALL)

    cache = llama.init_cache(SMALL, 1, t_total)
    pre, cache = llama.forward(params, x[:, :t_prefill], pos_full[:, :t_prefill],
                               cache=cache, cache_pos=0, cfg=SMALL)
    np.testing.assert_allclose(np.asarray(pre), np.asarray(full[:, :t_prefill]), atol=1e-4)
    outs = [pre]
    for i in range(t_prefill, t_total):
        h, cache = llama.decode_step(params, x[:, i:i + 1], pos_full[:, i:i + 1],
                                     cache, jnp.int32(i), cfg=SMALL)
        outs.append(h)
    stepped = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stepped), np.asarray(full), atol=1e-4)


def test_left_padding_invariance(hf_pair, rng):
    """Left-padded prefill (bucketing) must equal exact-length prefill."""
    _, params = hf_pair
    t, pad = 6, 4
    x = rng.standard_normal((1, t, 64)).astype(np.float32) * 0.1
    pos = jnp.arange(t)[None]
    exact, _ = llama.forward(params, jnp.asarray(x), pos, cfg=SMALL)

    xp = np.concatenate([np.ones((1, pad, 64), np.float32), x], axis=1)
    pos_p = jnp.concatenate([jnp.zeros((1, pad), jnp.int32),
                             jnp.arange(t)[None]], axis=1)
    tt = t + pad
    causal = np.tril(np.ones((tt, tt), bool))
    causal[:, :pad] = False  # nothing attends to pads
    padded, _ = llama.forward(params, jnp.asarray(xp), pos_p,
                              attn_mask=jnp.asarray(causal)[None], cfg=SMALL)
    np.testing.assert_allclose(np.asarray(padded[:, pad:]), np.asarray(exact), atol=1e-4)


def test_rope_llama3_scaling_shape():
    inv = llama._scaled_inv_freq(LlamaConfig())
    assert inv.shape == (32,)
    assert (np.diff(inv) < 0).all()  # monotonically decreasing frequencies


def test_deferred_kv_insert_matches_eager(hf_pair, rng, monkeypatch):
    """Round-4: the decode path defers all layers' k/v cache rows into ONE
    stacked insert per step, feeding attention the current row explicitly
    (the 60-op dynamic_update_slice chain cost 434 us/step at B=2 on v5e).
    Kill-switch CHATTERBOX_DEFER_KV=0 restores insert-first; both must give
    the same hidden states and identical final cache contents."""
    _, params = hf_pair
    t_prefill, t_total = 8, 11
    x = jnp.asarray(rng.standard_normal((2, t_total, 64)).astype(np.float32) * 0.1)
    pos = jnp.broadcast_to(jnp.arange(t_total)[None], (2, t_total))

    def run():
        cache = llama.init_cache(SMALL, 2, 16)
        _, cache = llama.forward(params, x[:, :t_prefill], pos[:, :t_prefill],
                                 cache=cache, cache_pos=0, cfg=SMALL)
        hs = []
        for i in range(t_prefill, t_total):
            h, cache = llama.decode_step(params, x[:, i:i + 1], pos[:, i:i + 1],
                                         cache, jnp.int32(i), cfg=SMALL)
            hs.append(np.asarray(h))
        return np.concatenate(hs, 1), np.asarray(cache.k), np.asarray(cache.v)

    monkeypatch.setenv("CHATTERBOX_DEFER_KV", "0")
    h_eager, k_eager, v_eager = run()
    monkeypatch.setenv("CHATTERBOX_DEFER_KV", "1")
    h_defer, k_defer, v_defer = run()
    np.testing.assert_allclose(h_defer, h_eager, atol=1e-5, rtol=1e-5)
    # cache contents agree to fp32 rounding (the stacked write fuses the
    # rope/cast chain differently than 60 per-layer writes)
    np.testing.assert_allclose(k_defer, k_eager, atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(v_defer, v_eager, atol=1e-6, rtol=1e-5)


def test_defer_kv_default_is_insert_first(hf_pair, monkeypatch):
    """Round-4 arbitration (PERF_NOTES q4i/q4k): the deferred stacked
    insert never wins on the product path — eager 2.439 vs defer 2.634
    ms/step at bf16 flash B=2, neutral at int8, and 2x better at batch-16
    XLA (4.79 vs 10.2; the appended-column variant defeats the int8
    convert-into-dot fusion, and the q4j traces show the stacked update
    is not aliased in place). With CHATTERBOX_DEFER_KV unset the decode
    is insert-first EVERYWHERE; =1 re-enables the deferred path.
    Structural pin via the lowered jaxpr's cache-update count."""
    _, params = hf_pair
    cache = llama.init_cache(SMALL, 2, 16)
    x = jnp.zeros((2, 1, 64), jnp.float32)
    pos = jnp.zeros((2, 1), jnp.int32)

    def count_dus():
        # fresh function object per trace — make_jaxpr goes through the jit
        # trace cache, which is keyed on function identity and would
        # otherwise return the previous env's trace
        def step(c):
            _, c2 = llama.decode_step(params, x, pos, c, jnp.int32(4),
                                      cfg=SMALL)
            return c2
        return str(jax.make_jaxpr(step)(cache)).count("dynamic_update_slice")

    monkeypatch.delenv("CHATTERBOX_DEFER_KV", raising=False)
    assert count_dus() == 2 * SMALL.num_layers    # insert-first per layer
    monkeypatch.setenv("CHATTERBOX_DEFER_KV", "1")
    assert count_dus() == 2                       # one stacked k + one v


def test_pin_cache_row_major_engages(monkeypatch):
    """pin_cache_row_major must bind a real layout_constraint, not silently
    fall back (the round-4 first cut passed Format(Layout(...)) — its
    constructor raised and a blanket except made the pin a no-op, leaving
    ~475 us/step of full-cache copies in the decode loop; the r4e device
    trace caught it). Guards both the eager path and the traced binding."""
    monkeypatch.setenv("CHATTERBOX_PIN_KV", "1")
    cache = llama.init_cache(SMALL, 2, 16)
    pinned = llama.pin_cache_row_major(cache)
    assert pinned.k.shape == cache.k.shape

    def f(c):
        return llama.pin_cache_row_major(c).k.sum()

    jaxpr = str(jax.make_jaxpr(f)(cache))
    assert "layout_constraint" in jaxpr, (
        "pin_cache_row_major fell back silently — the layout API call "
        "is broken again")
