"""Fused first-chunk synthesis: ONE device dispatch from text embeddings to
the first audio samples.

Round-1 TTFA was 0.304 s because the first chunk crossed the host/device
boundary 5-6 times (T3 prefill, decode block, flow, vocoder, transfers) and
each hop pays a full RTT on remote-dispatch backends. Here context build,
prefill, the first decode block, the windowed flow and the vocoder window
are ONE jitted program; the host only tokenizes text and slices the result.

The returned state bundle (DecodeState, mu_tail, mel tail, phase carry) is
exactly what tts.stream_generate's windowed loop consumes, so streaming can
continue from it without recomputation.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .config import ChatterboxConfig
from .models import t3 as t3_mod
from .models import s3gen as s3gen_mod
from .models import hifigan as hift_mod


class FirstChunk(NamedTuple):
    state: t3_mod.DecodeState     # resumable T3 decode state
    tokens: jnp.ndarray           # (block, 1) generated ids
    n_new: jnp.ndarray            # () tokens actually generated
    wav: jnp.ndarray              # (1, r*(block)*480) padded waveform
    n_valid_mel: jnp.ndarray      # () valid mel frames in `wav`
    mu_tail: jnp.ndarray          # (1, PIN, 80) flow continuity tail
    mel_tail: jnp.ndarray         # (1, M, 80) vocoder context tail
    phase_carry: jnp.ndarray      # (1, nh+1) harmonic phase carry


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "block", "total", "use_flash", "voc_ctx",
                     "dtype"))
def _first_chunk_impl(t3_params, s3_params, cond, text_tokens, key, sp, limit,
                      prompt_tokens, prompt_feat, embedding, phase_key, pad,
                      cfg: ChatterboxConfig, block: int, total: int,
                      use_flash: bool, voc_ctx: int, dtype):
    t3c = cfg.t3
    s3c = cfg.s3gen
    r = s3c.flow.token_mel_ratio
    look = s3c.flow.pre_lookahead_len

    # --- T3: context + prefill + first decode block (t3.start_generation
    # semantics for the single-utterance CFG path). text_tokens come
    # host-padded to the bucket and `pad` is a traced operand: one compiled
    # first-chunk program per bucket serves every text length.
    context = t3_mod._build_context(t3_params, cond, text_tokens, t3c, True,
                                    pad=pad)
    p_len = context.shape[1]
    state = t3_mod.prefill.__wrapped__(t3_params, context, t3c, total, pad,
                                       True, dtype, None)
    state, tokens, n_new = t3_mod.decode_block.__wrapped__(
        t3_params, state, key, sp, jnp.float32(1.0), limit, t3c, block,
        p_len, pad, True, False, True, use_flash, dtype, None, None, None,
        None)

    # --- flow window (first window: no context, absolute frame 0)
    win = jnp.swapaxes(tokens, 0, 1)                       # (1, block)
    win = jnp.where(win >= s3c.flow.vocab_size, 0, win)    # EOS slot -> pad id
    vlen = jnp.maximum(n_new, 1)[None]
    pin = r * (6 - look)  # ChatterboxTTS.STREAM_CTX_TOKENS - lookahead
    mu_pin0 = jnp.zeros((1, pin, s3c.mel_num), jnp.float32)
    mel_gen, mu_tail = s3gen_mod._flow_to_mel_window_impl(
        s3_params, win, vlen, prompt_tokens, prompt_feat, embedding,
        mu_pin0, jnp.int32(0), jnp.int32(0), False, s3c, dtype)

    # --- vocoder window over the emittable frames
    n_valid = r * jnp.maximum(n_new - look, 0)
    mel_win = mel_gen[:, : r * block]
    up = s3c.hift.total_upsample
    m_next = jnp.minimum(voc_ctx, n_valid)
    carry_idx = jnp.maximum((n_valid - m_next) * up - 1, 0)
    wav, carry = hift_mod._stream_impl(
        s3_params["hift"], mel_win, phase_key, jax.random.fold_in(phase_key, 0),
        jnp.zeros((1, s3c.hift.nb_harmonics + 1), jnp.float32), carry_idx,
        s3c.hift, dtype)
    fade = jnp.asarray(s3gen_mod.trim_fade())
    wav = wav.at[:, : fade.shape[0]].multiply(fade)
    # vocoder context tail = last voc_ctx VALID frames
    tail_start = jnp.maximum(n_valid - voc_ctx, 0)
    mel_tail = jax.lax.dynamic_slice_in_dim(mel_win, tail_start, voc_ctx, axis=1)
    return FirstChunk(state, tokens, n_new, wav, n_valid, mu_tail, mel_tail, carry)


def first_chunk(t3_params, s3_params, cond, text_tokens: np.ndarray, *,
                prompt_tokens, prompt_feat, embedding,
                block_tokens: int = 25, max_new_tokens: int = 1000,
                temperature: float = 0.6, cfg_weight: float = 0.3,
                repetition_penalty: float = 1.2, min_p: float = 0.05,
                seed: int = 0, voc_ctx: int = 8,
                cfg: ChatterboxConfig = ChatterboxConfig(),
                dtype=jnp.float32) -> FirstChunk:
    """Synthesize the first `block_tokens` of speech in one dispatch.

    Returns a FirstChunk whose `wav[0, : n_valid_mel*480]` is the emittable
    audio. CFG is always on (cfg_weight > 0 is the deployed configuration)."""
    assert cfg_weight > 0, "fused first chunk supports the CFG path"
    tt_np = np.atleast_2d(np.asarray(text_tokens, np.int32))
    lt = tt_np.shape[1]
    bucket = min(t3_mod._bucket(lt), cfg.t3.max_text_seq_len)
    pad = bucket - lt
    # host-side bucket pad: no extra device dispatch on the TTFA path
    text_tokens = jnp.asarray(np.pad(tt_np, ((0, 0), (pad, 0))))
    # + BOS pair (CFG rows share shape); cond_width mirrors cond_embeds for
    # conds without prompt tokens
    p_len = pad + lt + t3_mod.cond_width(cond, cfg.t3) + 2
    cap = p_len + max(max_new_tokens, block_tokens)
    use_flash = t3_mod._use_pallas_decode()
    total = -(-cap // 256) * 256 if use_flash else cap
    sp = t3_mod.SamplingParams(jnp.float32(temperature), jnp.float32(cfg_weight),
                               jnp.float32(repetition_penalty), jnp.float32(min_p))
    return _first_chunk_impl(
        t3_params, s3_params, cond, text_tokens, jax.random.PRNGKey(seed), sp,
        jnp.int32(max_new_tokens), prompt_tokens, prompt_feat, embedding,
        jax.random.PRNGKey(seed), jnp.int32(pad), cfg, block_tokens, total,
        use_flash, voc_ctx, dtype)
