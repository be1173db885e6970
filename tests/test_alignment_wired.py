"""Alignment-informed decode: the on-device analyzer wired into decode_block
(reference hook: models/t3/inference/alignment_stream_analyzer.py:59-154 —
attention spy on a Llama layer driving EOS suppression / forcing)."""
import numpy as np
import jax
import jax.numpy as jnp

from chatterbox_embed_tpu.config import T3Config, LlamaConfig
from chatterbox_embed_tpu.models import t3

TINY = T3Config(
    llama=LlamaConfig(hidden_size=64, intermediate_size=128, num_layers=2,
                      num_heads=4, num_kv_heads=4, head_dim=16),
    text_tokens_dict_size=50, speech_tokens_dict_size=40,
    start_speech_token=36, stop_speech_token=37,
    max_text_tokens=64, max_speech_tokens=256,
    speaker_embed_size=16, speech_cond_prompt_len=6)


def _cond(rng):
    return t3.T3Cond(
        speaker_emb=jnp.asarray(rng.standard_normal((1, 16)).astype(np.float32)),
        cond_prompt_speech_tokens=jnp.asarray(rng.integers(0, 36, (1, 6)).astype(np.int32)),
        emotion_adv=0.5)


def _text(rng, lt=12):
    text = rng.integers(1, 50, (1, lt)).astype(np.int32)
    text[:, 0] = 5
    text[:, -1] = 0
    return text


def test_alignment_flags_policy():
    """Unit policy checks: repetition / long-tail force EOS; incomplete
    suppresses it (mirrors models/alignment.py bias_logits)."""
    # the flags function is defined inside decode_block; replicate its math
    def flags(ring, complete, completed_at, i):
        st = t3.AlignState(jnp.asarray(ring, jnp.int32),
                           jnp.asarray(complete), jnp.asarray(completed_at, jnp.int32))
        long_tail = st.complete & ((i - st.completed_at) > 15)
        back = (st.ring[:, 1:] < st.ring[:, :-1] - 3)
        repetition = jnp.sum(back, axis=1) >= 3
        force = long_tail | repetition
        return np.asarray(force), np.asarray(~st.complete & ~force)

    # monotonic, incomplete -> suppress EOS, no force
    f, s = flags([[0, 2, 4, 6, 8, 10]], [False], [0], 6)
    assert not f[0] and s[0]
    # pathological repetition: attention keeps jumping backwards -> force
    f, s = flags([[10, 2, 9, 1, 8, 0]], [False], [0], 6)
    assert f[0] and not s[0]
    # long tail: completed 20 steps ago -> force
    f, s = flags([[10, 10, 10, 10, 10, 10]], [True], [5], 26)
    assert f[0] and not s[0]
    # just completed -> neither force nor suppress
    f, s = flags([[4, 5, 6, 7, 8, 10]], [True], [25], 26)
    assert not f[0] and not s[0]


def test_alignment_forces_eos_on_random_model(rng):
    """Random weights produce non-monotonic attention; the analyzer must
    terminate generation via forced EOS well before max_new_tokens."""
    params = t3.init(jax.random.PRNGKey(0), TINY)
    out = t3.generate(params, _cond(rng), _text(rng), max_new_tokens=200,
                      cfg_weight=0.5, seed=3, alignment=True, cfg=TINY)
    assert out[-1] == TINY.stop_speech_token
    assert len(out) < 200, "alignment policy never fired"


def test_alignment_suppresses_early_eos(rng):
    """With alignment on, EOS cannot be emitted before attention has covered
    the text — the first tokens are never EOS even if sampling would pick it."""
    params = t3.init(jax.random.PRNGKey(1), TINY)
    out = t3.generate(params, _cond(rng), _text(rng), max_new_tokens=64,
                      cfg_weight=0.0, temperature=5.0, seed=0, alignment=True,
                      cfg=TINY)
    assert out[0] != TINY.stop_speech_token


def test_alignment_zero_recompiles_across_text_lengths(rng):
    """CHATTERBOX_ALIGNMENT decode must keep the one-program-per-bucket
    property: text_start/text_len are traced operands, so different text
    lengths in one bucket reuse the SAME compiled prefill + decode programs
    (VERDICT r2 weak #8)."""
    params = t3.init(jax.random.PRNGKey(0), TINY)
    cond = _cond(rng)
    t3._context_prefill.clear_cache()
    t3.decode_block.clear_cache()
    for lt in (9, 11, 14):   # all inside the 48-bucket
        out = t3.generate(params, cond, _text(rng, lt), max_new_tokens=8,
                          seed=0, cfg_weight=0.4, alignment=True, cfg=TINY)
        assert out.size >= 1
    assert t3._context_prefill._cache_size() == 1
    assert t3.decode_block._cache_size() == 1


def test_alignment_batched_per_row_text_lens(rng):
    """Batched right-padded rows carry per-row text_len: a short row's
    completion test uses ITS length, not the padded width, so it can reach
    the text tail and terminate (round-2 advisor medium finding)."""
    params = t3.init(jax.random.PRNGKey(3), TINY)
    cond = _cond(rng)
    lt = 16
    rows = np.zeros((3, lt), np.int32)
    lens = np.asarray([6, 11, 16], np.int32)
    for i, n in enumerate(lens):
        rows[i, :n] = rng.integers(1, 50, (n,)).astype(np.int32)
        rows[i, 0] = 5
    outs = t3.generate_batch(params, cond, rows, max_new_tokens=64,
                             cfg_weight=0.5, seed=1, text_lens=lens,
                             alignment=True, cfg=TINY)
    assert len(outs) == 3
    for seq in outs:
        # every row terminates well before max_new_tokens: the per-row
        # policy (completion or repetition force) must be able to fire
        assert seq[-1] == TINY.stop_speech_token
        assert len(seq) < 64


def test_alignment_off_unchanged(rng):
    """alignment=False must be deterministic and unaffected by the carried
    (inert) alignment state."""
    params = t3.init(jax.random.PRNGKey(2), TINY)
    cond, text = _cond(rng), _text(rng)
    a = t3.generate(params, cond, text, max_new_tokens=24,
                    cfg_weight=0.5, seed=7, cfg=TINY)
    b = t3.generate(params, cond, text, max_new_tokens=24,
                    cfg_weight=0.5, seed=7, alignment=False, cfg=TINY)
    np.testing.assert_array_equal(a, b)
