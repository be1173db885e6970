"""T3: token-to-token speech LM — [cond; text] -> speech tokens
(reference: models/t3/t3.py, modules/cond_enc.py, modules/perceiver.py,
modules/learned_pos_emb.py, inference/t3_hf_backend.py).

TPU design (replaces the reference's HF-generate shim + python decode loop):
- the WHOLE generation is one jitted function per (text-bucket, max-new)
  pair: prefill forward + a lax.while_loop decode that early-exits on EOS.
- CFG (cond/uncond) is a fused batch of 2 rows through prefill and decode —
  one model pass per token, exactly like the reference's batch-2 trick
  (t3.py:291-297) but without per-step dispatch.
- sampling (vocab mask, temperature, repetition penalty via a scatter-add
  count buffer, min-p, top-p) runs on-device; temperature/penalties are
  traced scalars so adaptive per-chunk parameters never recompile.
- text is LEFT-padded to the bucket with masked attention and pos-id 0, so
  bucketed results equal exact-length results bit-for-bit.
"""
from __future__ import annotations

import functools
import math
import os
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import T3Config
from ..ops import sampling
from . import layers as L
from . import llama


class T3Cond(NamedTuple):
    """Conditioning bundle (reference: cond_enc.py:11-38). A pytree."""
    speaker_emb: jnp.ndarray                       # (B, 256)
    cond_prompt_speech_tokens: Optional[jnp.ndarray] = None  # (B, 150)
    emotion_adv: float | jnp.ndarray = 0.5


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init(key, cfg: T3Config = T3Config()):
    k = L.split_keys(key, 16)
    d = cfg.hidden_size
    qdim = cfg.perceiver_num_queries
    qvar = math.sqrt(3.0) * math.sqrt(2.0 / (qdim + qdim))
    perceiver = {
        "query": L.uniform_(k[0], (1, qdim, d), qvar),
        "norm": L.layer_norm_init(d),
        "q": L.linear_init(k[1], d, d),
        "k": L.linear_init(k[2], d, d),
        "v": L.linear_init(k[3], d, d),
        "o": L.linear_init(k[4], d, d),
    }
    return {
        "llama": llama.init(k[5], cfg.llama),
        "text_emb": L.embedding_init(k[6], cfg.text_tokens_dict_size, d, 0.02),
        "speech_emb": L.embedding_init(k[7], cfg.speech_tokens_dict_size, d, 0.02),
        "text_pos_emb": L.embedding_init(k[8], cfg.max_text_seq_len, d, 0.02),
        "speech_pos_emb": L.embedding_init(k[9], cfg.max_speech_seq_len, d, 0.02),
        "text_head": L.linear_init(k[10], d, cfg.text_tokens_dict_size, bias=False),
        "speech_head": L.linear_init(k[11], d, cfg.speech_tokens_dict_size, bias=False),
        "cond_enc": {
            "spkr_enc": L.linear_init(k[12], cfg.speaker_embed_size, d),
            "emotion_adv_fc": L.linear_init(k[13], 1, d, bias=False),
            "perceiver": perceiver,
        },
    }


# ---------------------------------------------------------------------------
# conditioning
# ---------------------------------------------------------------------------

def _perceiver_attn(p, x1, x2, n_heads):
    """Shared-parameter attention block: LN both inputs, MHA, residual on x1
    (reference: perceiver.py:113-170)."""
    h1 = L.layer_norm(p["norm"], x1)
    h2 = L.layer_norm(p["norm"], x2)
    q = L.split_heads(L.linear(p["q"], h1), n_heads)
    kk = L.split_heads(L.linear(p["k"], h2), n_heads)
    v = L.split_heads(L.linear(p["v"], h2), n_heads)
    out = L.merge_heads(L.mha(q, kk, v))
    return x1 + L.linear(p["o"], out)


def perceiver_resample(p, h, n_heads=4):
    """32 learned queries cross-attend then self-attend (perceiver.py:173-212)."""
    query = jnp.broadcast_to(p["query"], (h.shape[0],) + p["query"].shape[1:])
    pre = _perceiver_attn(p, query, h, n_heads)
    return _perceiver_attn(p, pre, pre, n_heads)


def cond_embeds(params, cond: T3Cond, cfg: T3Config = T3Config()) -> jnp.ndarray:
    """T3CondEnc.forward + prompt-token embedding (reference: t3.py:72-79,
    cond_enc.py:64-97). Returns (B, 34, D)."""
    ce = params["cond_enc"]
    spk = L.linear(ce["spkr_enc"], cond.speaker_emb.reshape(-1, cfg.speaker_embed_size))
    parts = [spk[:, None, :]]
    if cond.cond_prompt_speech_tokens is not None:
        toks = cond.cond_prompt_speech_tokens
        emb = (L.embedding(params["speech_emb"], toks)
               + params["speech_pos_emb"]["w"][: toks.shape[1]][None])
        parts.append(perceiver_resample(ce["perceiver"], emb, cfg.perceiver_num_heads))
    emo = jnp.asarray(cond.emotion_adv, jnp.float32).reshape(-1, 1, 1)
    # emotion_adv may carry one value per utterance while the voice
    # (speaker/prompt) is shared — broadcast every part to the wider row count
    # (batched story chunks with per-chunk exaggeration)
    rows = max(spk.shape[0], emo.shape[0])
    emo = jnp.broadcast_to(emo, (rows, 1, 1))
    parts.append(L.linear(ce["emotion_adv_fc"], emo))
    parts = [jnp.broadcast_to(p, (rows,) + p.shape[1:]) for p in parts]
    return jnp.concatenate(parts, axis=1)


# ---------------------------------------------------------------------------
# training forward / loss (reference: t3.py:111-202)
# ---------------------------------------------------------------------------

def forward(params, cond: T3Cond, text_tokens, text_lens, speech_tokens, speech_lens,
            cfg: T3Config = T3Config(), dtype=jnp.float32):
    """Teacher-forced forward. Returns (text_logits, speech_logits)."""
    ce = cond_embeds(params, cond, cfg)
    b, lt = text_tokens.shape
    ls = speech_tokens.shape[1]
    te = (L.embedding(params["text_emb"], text_tokens)
          + params["text_pos_emb"]["w"][:lt][None])
    se = (L.embedding(params["speech_emb"], speech_tokens)
          + params["speech_pos_emb"]["w"][:ls][None])
    x = jnp.concatenate([jnp.broadcast_to(ce, (b,) + ce.shape[1:]), te, se], axis=1)
    t = x.shape[1]
    lc = ce.shape[1]
    pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    # causal mask + padding masks inside text/speech streams
    idx = jnp.arange(t)
    causal = idx[None, :] <= idx[:, None]
    text_valid = (idx[None] < lc) | ((idx[None] >= lc) & (idx[None] < lc + text_lens[:, None])) \
        | (idx[None] >= lc + lt)
    speech_valid = (idx[None] < lc + lt) | (idx[None] < lc + lt + speech_lens[:, None])
    key_valid = text_valid & speech_valid                      # (B, T)
    mask = causal[None] & key_valid[:, None, :]
    h, _ = llama.forward(params["llama"], x, pos, mask, cfg=cfg.llama, dtype=dtype)
    text_latents = h[:, lc - 1: lc - 1 + lt]      # predict token t from position t-1
    speech_latents = h[:, lc + lt - 1: lc + lt - 1 + ls]
    text_logits = L.linear(params["text_head"], text_latents, dtype)
    speech_logits = L.linear(params["speech_head"], speech_latents, dtype)
    return text_logits, speech_logits


def loss(params, cond: T3Cond, text_tokens, text_lens, speech_tokens, speech_lens,
         cfg: T3Config = T3Config(), dtype=jnp.float32):
    """Masked CE over text and speech streams (reference: t3.py:168-202).

    Note: the reference computes logits at the token's own position (an
    off-by-one it inherited); we use the standard next-token shift, which is
    the correct training objective for this decoder.
    """
    text_logits, speech_logits = forward(params, cond, text_tokens, text_lens,
                                         speech_tokens, speech_lens, cfg, dtype)

    def masked_ce(logits, targets, lens):
        lsm = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ll = jnp.take_along_axis(lsm, targets[..., None], axis=-1)[..., 0]
        m = jnp.arange(targets.shape[1])[None] < lens[:, None]
        return -jnp.sum(ll * m) / jnp.maximum(jnp.sum(m), 1)

    return (masked_ce(text_logits, text_tokens, text_lens),
            masked_ce(speech_logits, speech_tokens, speech_lens))


# ---------------------------------------------------------------------------
# inference: fused-CFG jitted generation
# ---------------------------------------------------------------------------

class SamplingParams(NamedTuple):
    """Each field is () — one setting for all rows — or (U, 1) for per-row
    settings (e.g. a lock-step batch of story chunks, each with its own
    adaptive temperature/cfg). All the sampling ops broadcast over the
    (U, V) logit rows either way."""
    temperature: jnp.ndarray
    cfg_weight: jnp.ndarray
    repetition_penalty: jnp.ndarray
    min_p: jnp.ndarray


def _sampling_param(value, n_utt: int) -> jnp.ndarray:
    """() scalar or length-U per-row vector -> broadcastable device array."""
    a = np.asarray(value, np.float32)
    if a.ndim == 0:
        return jnp.float32(a)
    if a.shape != (n_utt,):
        raise ValueError(
            f"per-row sampling param must have shape ({n_utt},), got {a.shape}")
    return jnp.asarray(a.reshape(n_utt, 1))


def _build_context(params, cond: T3Cond, text_tokens: jnp.ndarray,
                   cfg: T3Config, cfg_on: bool, pad=None):
    """Context embeddings with CFG row layout (reference: t3.py:81-109,
    284-297 — incl. the duplicated BOS the deployed inference path feeds when
    cfg_weight > 0).

    text_tokens: (U, T) — U utterances sharing one conditioning voice. Row
    layout: [cond rows 0..U-1; uncond rows 0..U-1] when CFG is on.

    pad=None: T is the exact text length; returns [cond; text; BOS(;BOS)].

    pad given (a host int or a TRACED scalar — the key to one compiled
    program per text bucket): T is the bucket width and text_tokens are
    LEFT-padded with dummy ids. Returns the fixed width pad-slots layout
    [junk(pad); cond; text; BOS(;BOS)]: a zeros base [0s(W); text; BOS] has
    the real text already at its final columns (W + c for bucket column c),
    so one dynamic_update_slice drops the cond block at column `pad`. The
    first `pad` columns hold junk (zeros / dummy-text embeddings); every
    attention mask in prefill/decode excludes keys < pad, and masked-softmax
    weights underflow to exactly 0.0, so valid positions are bit-identical
    to the unpadded computation.
    """
    ce = cond_embeds(params, cond, cfg)              # (1 or U, W, D)
    u, lt = text_tokens.shape
    te = L.embedding(params["text_emb"], text_tokens)    # (U, T, D)
    if cfg_on:
        te = jnp.concatenate([te, jnp.zeros_like(te)], axis=0)  # uncond: zero text
    if pad is None:
        te = te + params["text_pos_emb"]["w"][:lt][None]
    else:
        # bucket column c holds text position c - pad (clamped junk below)
        rows = jnp.maximum(jnp.arange(lt) - pad, 0)
        te = te + params["text_pos_emb"]["w"][rows][None]
    b = te.shape[0]
    if ce.shape[0] == u and cfg_on:
        # per-utterance conditioning (e.g. per-chunk emotion_adv): the uncond
        # rows keep the full conditioning, mirroring the single-row layout
        ce = jnp.concatenate([ce, ce], axis=0)
    else:
        ce = jnp.broadcast_to(ce, (b,) + ce.shape[1:])
    bos = (params["speech_emb"]["w"][cfg.start_speech_token]
           + params["speech_pos_emb"]["w"][0])[None, None, :]
    bos = jnp.broadcast_to(bos, (b, 1, bos.shape[-1]))
    if pad is None:
        parts = [ce, te, bos]
        if cfg_on:
            parts.append(bos)
        return jnp.concatenate(parts, axis=1)        # (B, P, D)
    w = ce.shape[1]
    parts = [jnp.zeros((b, w, te.shape[2]), te.dtype), te, bos]
    if cfg_on:
        parts.append(bos)
    base = jnp.concatenate(parts, axis=1)            # (B, W + T + nb, D)
    return jax.lax.dynamic_update_slice(base, ce.astype(base.dtype),
                                        (0, pad, 0))


def cond_width(cond: T3Cond, cfg: T3Config) -> int:
    """Number of conditioning columns cond_embeds will emit for this cond:
    spk(1) + perceiver(32, only when prompt tokens are present) + emotion(1).
    Must mirror cond_embeds exactly — decode cache positions derive from it."""
    n = 1
    if cond.cond_prompt_speech_tokens is not None:
        n += cfg.perceiver_num_queries
    return n + 1


def _pad_context(context: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Left-pad the context with masked zero-slots (text-bucket exactness)."""
    if not pad:
        return context
    return jnp.concatenate(
        [jnp.zeros((context.shape[0], pad, context.shape[2]), context.dtype),
         context], axis=1)


class AlignState(NamedTuple):
    """On-device alignment-analyzer state (the heuristics of
    models/alignment.py compiled into the decode loop — reference spy:
    alignment_stream_analyzer.py:59-154). Carried unconditionally (a few
    dozen bytes) so the DecodeState pytree is identical with/without it."""
    ring: jnp.ndarray           # (U, 6) last attended text positions
    complete: jnp.ndarray       # (U,) bool — attention reached the text tail
    completed_at: jnp.ndarray   # (U,) int32 step index at completion


class DecodeState(NamedTuple):
    """Resumable decode state: lives on device between blocks, enabling both
    streaming emission and one compiled block-program for all output lengths."""
    cache: llama.KVCache
    logits: jnp.ndarray         # (B, V) logits at the current position
    counts: jnp.ndarray         # (V,) int32 repetition-penalty counts
    i: jnp.ndarray              # () tokens generated so far
    done: jnp.ndarray           # () bool
    align: AlignState


@functools.partial(jax.jit, static_argnames=("cfg", "total", "cfg_on",
                                             "dtype", "kv_int8", "read_len"))
def prefill(params, context, cfg: T3Config, total: int, pad_len,
            cfg_on: bool = True, dtype=jnp.float32,
            key_valid=None, kv_int8: bool = False,
            read_len: int | None = None) -> DecodeState:
    """Full-context forward filling the static cache (capacity `total`).

    context: (B, P, D) with `pad_len` masked junk slots on the LEFT.
    pad_len is a TRACED operand: one compiled program serves every text
    length in a bucket (P and `total` are per-bucket constants).
    key_valid: optional (B, total) bool excluding per-row pad keys (batched
    right-padded text).
    read_len: optional STATIC prefix width — the prefill attention reads
    only cache slots [0, read_len) (the phased first phase; llama.forward
    docstring). The cache is still allocated at the FULL capacity `total`,
    so later phases reuse the same buffer with longer read programs.
    """
    b, p_len, d = context.shape
    cache = llama.init_cache(cfg.llama, b, total,
                             jnp.int8 if kv_int8 else dtype)
    w = read_len if read_len is not None else total
    idx = jnp.arange(p_len)
    kidx = jnp.arange(w)
    causal = ((kidx[None, :] <= idx[:, None]) & (kidx[None, :] >= pad_len))[None]
    if key_valid is not None:
        causal = causal & key_valid[:, None, :w]
    pos = jnp.broadcast_to(jnp.maximum(idx - pad_len, 0)[None], (b, p_len))
    h, cache = llama.forward(params["llama"], context, pos, causal,
                             cache=cache, cache_pos=0, cfg=cfg.llama,
                             dtype=dtype, read_len=read_len)
    # keep the slabs row-major OUT of prefill so the decode carry never
    # inherits the attention-transpose layout (llama.pin_cache_row_major)
    cache = llama.pin_cache_row_major(cache)
    logits0 = L.linear(params["speech_head"], h[:, -1], jnp.float32)
    n_utt = b // 2 if cfg_on else b
    counts0 = jnp.zeros((n_utt, cfg.speech_tokens_dict_size), jnp.int32
                        ).at[:, cfg.start_speech_token].set(1)
    align0 = AlignState(jnp.zeros((n_utt, 6), jnp.int32),
                        jnp.zeros((n_utt,), jnp.bool_),
                        jnp.zeros((n_utt,), jnp.int32))
    return DecodeState(cache, logits0, counts0,
                       jnp.int32(0), jnp.zeros((n_utt,), jnp.bool_), align0)


@functools.partial(jax.jit, static_argnames=("cfg", "total", "cfg_on",
                                             "dtype", "kv_int8", "read_len"))
def _context_prefill(params, cond: T3Cond, text_tokens, key_valid, pad_len,
                     cfg: T3Config, total: int, cfg_on: bool,
                     dtype=jnp.float32, kv_int8: bool = False,
                     read_len: int | None = None) -> DecodeState:
    """Fused cond-embed + context build + prefill (single host dispatch).

    text_tokens: (U, bucket) LEFT-padded to the bucket on the host; pad_len
    is a traced operand — one program per (bucket, batch) pair serves every
    text length."""
    context = _build_context(params, cond, text_tokens, cfg, cfg_on,
                             pad=pad_len)
    return prefill(params, context, cfg, total, pad_len, cfg_on, dtype,
                   key_valid, kv_int8, read_len)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "block", "p_len", "cfg_on",
                                    "use_top_p", "stop_on_eos", "use_flash", "dtype",
                                    "align_layer", "use_fused", "read_len"),
                   donate_argnames=("state",))
def decode_block(params, state: DecodeState, key, sp: SamplingParams, top_p, limit,
                 cfg: T3Config, block: int, p_len: int, pad_len, cfg_on: bool,
                 use_top_p: bool, stop_on_eos: bool, use_flash: bool,
                 dtype=jnp.float32, key_valid=None,
                 align_layer: int | None = None,
                 text_start=None, text_len=None, hole=None,
                 use_fused: bool = False, fused=None,
                 read_len: int | None = None):
    """Decode up to `block` tokens (stopping at EOS or the dynamic `limit`).

    Returns (state, tokens (block,) int32, n_new ()). One compiled program per
    (bucket, block) pair serves every requested output length AND every text
    length in the bucket: p_len is the per-bucket constant context width and
    pad_len is a traced operand. The alignment path keeps that property:
    text_start (scalar) and text_len ((U,)) are TRACED operands too, so
    CHATTERBOX_ALIGNMENT=1 adds zero recompiles across text lengths.

    When `align_layer` is set, layer N's attention over the text span
    [text_start, text_start + text_len[row]) in cache coordinates drives the
    on-device alignment policy per row: EOS is suppressed until attention
    reaches the text tail, and forced on long-tail dwell or repeated backward
    jumps (reference: alignment_stream_analyzer.py:89-154). Composes with the
    flash decode kernel (only the spy layer runs XLA attention) and with
    per-row key_valid masks (batched right-padded text).

    read_len (STATIC): phased-cache prefix width — attention reads only
    cache slots [0, read_len) while the cache keeps its full capacity (one
    allocation for every phase; llama.forward docstring). One compiled
    program per (bucket, block, read_len); the final phase passes None and
    shares the unphased program.
    """
    total = state.cache.k.shape[1]
    w_keys = read_len if read_len is not None else total
    if key_valid is not None and read_len is not None:
        key_valid = key_valid[:, :read_len]
    b = state.logits.shape[0]
    n_utt = state.done.shape[0]
    d = params["speech_emb"]["w"].shape[1]
    eos = cfg.stop_speech_token

    def alignment_flags(align: AlignState, i):
        """(force_eos, suppress_eos) per utterance from the analyzer state."""
        long_tail = align.complete & ((i - align.completed_at) > 15)
        back = (align.ring[:, 1:] < align.ring[:, :-1] - 3)
        repetition = jnp.sum(back, axis=1) >= 3
        force = long_tail | repetition
        return force, ~align.complete & ~force

    def sample_from(logits, counts, k, align, i):
        if cfg_on:
            lc, lu = logits[:n_utt], logits[n_utt:]
            lg = lc + sp.cfg_weight * (lc - lu)          # (U, V)
        else:
            lg = logits
        lg = sampling.process_logits(
            lg, counts, valid_size=cfg.start_speech_token, eos_id=eos,
            temperature=sp.temperature,
            repetition_penalty_val=sp.repetition_penalty,
            min_p=sp.min_p, top_p=top_p, use_top_p=use_top_p)
        if align_layer is not None:
            force, suppress = alignment_flags(align, i)
            eos_oh = (jnp.arange(lg.shape[-1]) == eos)
            forced = jnp.where(eos_oh[None], 0.0, jnp.float32(-1e30))
            lg = jnp.where(force[:, None], forced, lg)
            lg = jnp.where(suppress[:, None] & eos_oh[None], jnp.float32(-1e30), lg)
        return sampling.sample_token(k, lg)              # (U,)

    class Carry(NamedTuple):
        state: DecodeState
        tokens: jnp.ndarray          # (block, U)
        j: jnp.ndarray

    def cond_fn(c: Carry):
        return (~jnp.all(c.state.done)) & (c.j < block) & (c.state.i < limit)

    def body_fn(c: Carry):
        s = c.state
        k = jax.random.fold_in(key, s.i)
        tok = sample_from(s.logits, s.counts, k, s.align, s.i)   # (U,)
        # rows already finished keep emitting EOS (masked out by callers)
        tok = jnp.where(s.done, eos, tok)
        tokens = c.tokens.at[c.j].set(tok.astype(jnp.int32))
        counts = s.counts.at[jnp.arange(n_utt), tok].add(1)
        done = s.done | ((tok == eos) if stop_on_eos else False)
        emb = (L.embedding(params["speech_emb"], tok)
               + params["speech_pos_emb"]["w"][s.i + 1][None])   # (U, D)
        if cfg_on:
            emb = jnp.concatenate([emb, emb], axis=0)
        emb = emb[:, None, :]
        pos_id = jnp.full((b, 1), p_len - pad_len + s.i, jnp.int32)
        cache_pos = p_len + s.i
        lmask = (jnp.arange(w_keys)[None, None, :] <= cache_pos) & \
                (jnp.arange(w_keys)[None, None, :] >= pad_len)
        if key_valid is not None:
            lmask = lmask & key_valid[:, None, :]
        if align_layer is not None:
            hh, cache2, arow = llama.forward(
                params["llama"], emb.astype(dtype), pos_id, lmask,
                cache=s.cache, cache_pos=cache_pos, cfg=cfg.llama, dtype=dtype,
                flash_decode=use_flash, flash_start=pad_len, flash_hole=hole,
                collect_attn_layer=align_layer, read_len=read_len)
            # per-row text window [text_start, text_start + text_len[row])
            # masked out of the full attention row — text_start/text_len are
            # traced, so one program per bucket serves every text length
            kidx = jnp.arange(w_keys)
            in_text = ((kidx[None, :] >= text_start)
                       & (kidx[None, :] < text_start + text_len[:, None]))
            trow = arow[:n_utt] * in_text
            trow = trow / jnp.maximum(jnp.sum(trow, axis=-1, keepdims=True), 1e-9)
            pos = jnp.argmax(trow, axis=-1).astype(jnp.int32) - text_start
            reached = pos >= text_len - 2
            newly = reached & ~s.align.complete
            align2 = AlignState(
                jnp.concatenate([s.align.ring[:, 1:], pos[:, None]], axis=1),
                s.align.complete | reached,
                jnp.where(newly, s.i + 1, s.align.completed_at))
        elif use_fused:
            # monolithic weight-streaming step: the whole backbone as ONE
            # Pallas program (kernels/fused_decode.py) — lmask semantics are
            # reproduced in-kernel ([pad_len, cache_pos] walk), so key_valid /
            # hole / alignment must be absent (start_generation gates this)
            from ..kernels.fused_decode import fused_decode_step
            h1, k2, v2 = fused_decode_step(
                fused, emb[:, 0].astype(dtype), s.cache.k, s.cache.v,
                cache_pos, pad_len, cfg.llama, dtype=dtype)
            hh = h1[:, None]
            cache2 = llama.KVCache(k2, v2)
            align2 = s.align
        else:
            hh, cache2 = llama.forward(params["llama"], emb.astype(dtype), pos_id,
                                       lmask, cache=s.cache, cache_pos=cache_pos,
                                       cfg=cfg.llama, dtype=dtype,
                                       flash_decode=use_flash, flash_start=pad_len,
                                       flash_hole=hole, read_len=read_len)
            align2 = s.align
        logits = L.linear(params["speech_head"], hh[:, -1], jnp.float32)
        return Carry(DecodeState(cache2, logits, counts, s.i + 1, done, align2),
                     tokens, c.j + 1)

    # pin the carry's cache slabs row-major: the while-loop carry otherwise
    # inherits whatever layout the jit INPUT buffer arrived in, and a
    # sequence-minor cache costs a full-slab transpose EVERY step (see
    # llama.pin_cache_row_major)
    state = state._replace(cache=llama.pin_cache_row_major(state.cache))
    init = Carry(state, jnp.zeros((block, n_utt), jnp.int32), jnp.int32(0))
    final = jax.lax.while_loop(cond_fn, body_fn, init)
    return final.state, final.tokens, final.j


def _use_pallas_decode() -> bool:
    """Pallas decode kernel: on for TPU backends, off on CPU; override via
    CHATTERBOX_PALLAS=0/1 (shared gate: layers.pallas_gate)."""
    return L.pallas_gate(True)


# Derived phased-cache geometry: the q4s/q4ag A/Bs bracket the phase
# length, not a magic K — 64-token phases lose (q4s K=4 at a 250 cap:
# +8.7%/step, switches too frequent), a single 250-token cache is barely
# worth splitting (q4s K=2: -3%), and 256-token phases at the product's
# default 1000-token cap win big (q4ag K=4: t3 10.72 -> 7.68 s/request,
# -28.4%/step; K=2's 512-token phases gave -19.5%). So: derive
# K = ceil(gen_cap / 256) (~256-token phases at every cap), gated to long
# caps where the dead-capacity reads dominate.
_PHASED_MIN_CAP = 600
_PHASED_PHASE_LEN = 256


_phased_env_warned = False


def _phased_cache_k(gen_cap: int = 0) -> int:
    """Phase count for the batched XLA decode's prefix reads. The XLA
    attention reads the WHOLE static cache capacity every step while the
    live prefix grows from p_len to cap — at the product's default
    1000-token cap the average live/cap ratio is ~40%, and batched decode
    is KV-bandwidth bound (PERF_NOTES). With K phases the request decodes
    through K compiled programs whose attention statically slices
    successively longer prefixes (64-aligned) of ONE full-capacity cache —
    no reallocation, no migration; EOS early-exit means short generations
    never reach the long-prefix programs at all. Cost: K compiled
    (read_len, block) decode programs per bucket instead of one.

    CHATTERBOX_PHASED_CACHE always wins (0/1 = single-capacity everywhere,
    K >= 2 forced); unset derives ~256-token phases for long caps
    (gen_cap >= _PHASED_MIN_CAP; K=4 at the default 1000-token cap) and
    single-capacity below (q4s/q4ag tables in PERF_NOTES). An unparseable
    value warns ONCE and falls back to the derivation (a typo'd env var
    must not silently cost the -28%/step win). Trace-time binding like the
    other decode knobs."""
    raw = os.getenv("CHATTERBOX_PHASED_CACHE", "").strip()
    if raw:
        try:
            return int(raw)
        except ValueError:
            global _phased_env_warned
            if not _phased_env_warned:
                _phased_env_warned = True
                import warnings
                warnings.warn(
                    f"CHATTERBOX_PHASED_CACHE={raw!r} is not an integer; "
                    f"falling back to the derived phase count")
    if gen_cap < _PHASED_MIN_CAP:
        return 0
    return -(-gen_cap // _PHASED_PHASE_LEN)


def _use_fused_step() -> bool:
    """Monolithic weight-streaming decode-step kernel (kernels/fused_decode):
    the whole 30-layer token step as ONE Pallas program riding a weight DMA
    ring. OPT-IN (CHATTERBOX_FUSED_STEP=1): the round-3 sweep measured it at
    2.70 ms/step vs 2.61 for the per-op path — per-block-iteration overhead
    eats the dispatch savings (ring depth 4 vs 8 identical, so the DMA is
    already hidden; see PERF_NOTES.md round-3 fused-step study)."""
    return os.getenv("CHATTERBOX_FUSED_STEP", "0") == "1" and L.pallas_gate(True)


# stacked wall-layout weights per llama-params identity (built once per model
# load; the entry keeps a strong ref to its source so the id cannot be reused)
_FUSED_STACK_CACHE: dict = {}


def _fused_params(params, cfg: T3Config, dtype):
    from ..kernels.fused_decode import stack_for_fused
    key = (id(params["llama"]), jnp.dtype(dtype).name)
    ent = _FUSED_STACK_CACHE.get(key)
    if ent is None:
        if len(_FUSED_STACK_CACHE) >= 4:
            _FUSED_STACK_CACHE.pop(next(iter(_FUSED_STACK_CACHE)))
        ent = (stack_for_fused(params["llama"], cfg.llama, dtype),
               params["llama"])
        _FUSED_STACK_CACHE[key] = ent
    return ent[0]


_TEXT_BUCKETS = (48, 96, 192, 384, 768)


def _bucket(n: int) -> int:
    for bkt in _TEXT_BUCKETS:
        if n <= bkt:
            return bkt
    return n


# Tokens per compiled decode block. The while_loop exits the moment every row
# hits EOS, so a large block wastes no compute — it only saves host dispatches
# (each one a full RTT on remote backends). Streaming callers pass their own
# smaller block for early emission.
DECODE_BLOCK = 256
MAX_DECODE_UTTERANCES = 16  # single-chip fused-batch cap (see PERF_NOTES.md)

# Validated single-chip decode KV envelope in CACHE BYTES (rows x capacity x
# per-token-row KV bytes). The fence is bytes, not rows: measured GREEN at
# 1.53 GB (64 CFG rows x capacity 388 int8 — q4af b32 headline), 2.23 GB
# (32 rows x 1132 — q4ag/q5a b16 x 1000-cap) and 2.54 GB (the q4ac worker's
# 16-slot engine, 32 rows x capacity 1292); reproducible worker CRASH at
# 4.45 GB (64 rows x 1132) — phased or not, q4ah + q5a 6/6 tries
# (measurements/q5a_b32_t1000_{derived,off}.err). The q5c bisect brackets
# the wall: 3.10 GB (64 rows x 732) and 3.34 GB (48 rows x 1132) BOTH
# crash, so the device limit sits in (2.54, 3.10] GB and 2.6 GB is within
# ~18% of it — do not raise without a measured green cell
# (scripts/tpu_queue_r5c.sh pattern).
KV_FENCE_BYTES = int(os.getenv("CHATTERBOX_KV_FENCE_BYTES", 2_600_000_000))


def max_decode_utterances(cache_capacity: int | None = None, *,
                          rows_per_utt: int = 2,
                          cfg: T3Config | None = None,
                          kv_int8: bool | None = None) -> int:
    """Single-chip fused-batch cap in UTTERANCES.

    Without a capacity this is the short-cap fence (the round-3/4 studies:
    64 CFG rows of bf16 cache RESOURCE_EXHAUST the v5e; the int8 KV cache
    halves the slabs — 32 utterances un-sub-batched ran 1.4x faster per
    utterance-step than two sub-batches of 16, scripts/b64_product_probe.py).

    With `cache_capacity` (context + generation slots) the cap additionally
    honors KV_FENCE_BYTES, snapping down to a power of two so long-cap
    batches reuse the warm shorter-batch programs: at the reference's
    1000-token cap a batch of 32 decodes as two sub-batches of 16 instead
    of crashing the worker at the 4.45 GB footprint. rows_per_utt is 2 under
    CFG (the fused dual-row layout), 1 otherwise.

    kv_int8 overrides the env-derived cache dtype — callers that pin their
    own cache mode (ContinuousDecoder's kv_int8 argument) must size against
    the cache they actually allocate, not the ambient default.
    CHATTERBOX_MAX_DECODE_UTT overrides everything for ops re-measurement.
    """
    env = os.getenv("CHATTERBOX_MAX_DECODE_UTT")
    if env:
        return int(env)
    if kv_int8 is None:
        kv_int8 = llama._kv_int8_mode() > 0
    base = 2 * MAX_DECODE_UTTERANCES if kv_int8 else MAX_DECODE_UTTERANCES
    if not cache_capacity:
        return base
    lcfg = (cfg or T3Config()).llama
    per_token_row = (lcfg.num_layers * 2 * lcfg.num_kv_heads * lcfg.head_dim
                     * (1 if kv_int8 else 2))
    rows = KV_FENCE_BYTES // max(int(cache_capacity) * per_token_row, 1)
    utts = max(int(rows) // max(rows_per_utt, 1), 1)
    snapped = 1
    while snapped * 2 <= utts:
        snapped *= 2
    return min(base, snapped)
# Flash decode gate, set by the round-4 PRODUCT-PATH A/B (PERF_NOTES.md
# "Round-4 flash-gate arbitration": bench.py --batch N over
# CHATTERBOX_FLASH_MAX_UTT, superseding the RTT-contaminated round-3 scan
# microbench): flash wins at 1-2 utterances (2.34/2.84 ms/step vs
# 3.02+ XLA), XLA wins from 4 up (3.28 vs 4.46 at batch 4, widening with
# batch). CHATTERBOX_FLASH_MAX_UTT overrides for ops re-measurement.
FLASH_DECODE_MAX_UTTERANCES = int(os.getenv("CHATTERBOX_FLASH_MAX_UTT", "2"))
# monolithic weight-streaming step (kernels/fused_decode.py): proven target is
# the single-utterance CFG pair (the 2.3 ms/step -> ~1.4 ms weight-stream
# floor); larger fused batches scale the cache-walk DMA traffic per step and
# need a measured crossover before raising this.
FUSED_STEP_MAX_UTTERANCES = int(os.getenv("CHATTERBOX_FUSED_MAX_UTT", "1"))


def start_generation(params, cond: T3Cond, text_tokens: np.ndarray, *,
                     cfg_weight: float, max_new_tokens: int,
                     text_lens: np.ndarray | None = None, mesh=None,
                     alignment: bool = False,
                     cfg: T3Config = T3Config(), dtype=jnp.float32):
    """Build context, left-pad to the text bucket, prefill. Returns
    (state, static_info) for decode_block calls.

    text_lens: per-utterance valid text lengths for the batched path (rows are
    right-padded to a common length; pad positions are masked out as attention
    keys for every subsequent step)."""
    tt_np = np.atleast_2d(np.asarray(text_tokens, np.int32))
    # per-row cfg weights: one any-row static flag decides the fused dual-row
    # layout. A zero-weight row's logit mix reduces to its cond logits, but it
    # still decodes under the CFG context layout (duplicated BOS slot), which
    # is NOT bit-identical to a cfg-off run of that row alone — callers mixing
    # weights per row accept CFG-layout semantics for every row.
    cfg_on = bool(np.any(np.asarray(cfg_weight, np.float32) > 0.0))
    u, lt = tt_np.shape
    if lt > cfg.max_text_seq_len:
        raise ValueError(f"text too long: {lt} tokens > max {cfg.max_text_seq_len}")
    pad = min(_bucket(lt), cfg.max_text_seq_len) - lt
    # context layout: [pad; cond; text; BOS(; BOS when CFG)] — the pad is
    # masked zero-slots on the LEFT so every text length in a bucket compiles
    # to the same program and computes the exact same result as unpadded
    p_len = pad + cond_width(cond, cfg) + lt + 1 + (1 if cfg_on else 0)
    n_utt = u
    # cache capacity: fixed per bucket so one block program serves all lengths
    cap = p_len + max(max_new_tokens, DECODE_BLOCK)
    cap_utt = max_decode_utterances(cap, rows_per_utt=2 if cfg_on else 1,
                                    cfg=cfg)
    if mesh is None and n_utt > cap_utt:
        # hard fence, not a silent cap: the decode KV footprint is bounded
        # by KV_FENCE_BYTES (64 CFG rows crash the v5e worker at the
        # 1000-token cap, 4.45 GB — q4ah/q5a; 64 bf16 rows RESOURCE_EXHAUST
        # even at short caps, scripts/repro_b64_decode_fault.py).
        # generate_batch sub-batches transparently; direct callers must do
        # the same or shard rows over a dp mesh.
        raise ValueError(
            f"{n_utt} utterances > max_decode_utterances({cap})={cap_utt} "
            f"for a single-chip fused decode (v5e HBM fence, "
            f"KV_FENCE_BYTES={KV_FENCE_BYTES}). Use generate_batch "
            f"(sub-batches automatically), enable the int8 KV cache "
            f"(CHATTERBOX_INT8_KV=1), or pass a dp mesh.")
    # Pallas decode kernel gate: measured crossover on v5e at the 1024-slot
    # cache (PERF_NOTES.md round-3 study) — the kernel wins 2.0x/1.7x/1.2x
    # at 2/8 rows and loses at 32 (its chunk walk is invocation-overhead
    # bound once the VMEM cap shrinks the slabs); large fused batches keep
    # the XLA attention, which wins per-utterance throughput at 16 utts
    use_flash = (_use_pallas_decode() and mesh is None
                 and n_utt <= FLASH_DECODE_MAX_UTTERANCES)
    # monolithic weight-streaming step: subsumes the flash attention kernel
    # (attention runs in-kernel); requires the plain [pad, pos] mask — ragged
    # text / alignment / mesh fall back to the per-op paths below
    use_fused = False
    if (_use_fused_step() and not alignment and mesh is None
            and n_utt <= FUSED_STEP_MAX_UTTERANCES
            # int8 backbones carry w_q/scale; the fused wall restack
            # (stack_for_fused) wants plain bf16 weights
            and "w" in params["llama"]["layers"][0]["q"]):
        from ..kernels.fused_decode import plan as _fused_plan
        use_fused = _fused_plan(cfg.llama, (2 if cfg_on else 1) * n_utt) is not None
    align_layer = None
    text_start = text_len = None
    if alignment:
        # alignment spy: ONE layer runs XLA attention to expose its
        # probabilities; the rest keep the flash kernel (llama.forward)
        from .alignment import ALIGNMENT_LAYER
        align_layer = min(ALIGNMENT_LAYER, cfg.llama.num_layers - 1)
        text_start = jnp.int32(pad + cond_width(cond, cfg))
        lens_np = (np.asarray(text_lens, np.int32) if text_lens is not None
                   else np.full((u,), lt, np.int32))
        text_len = jnp.asarray(lens_np)
    total = -(-cap // 256) * 256 if (use_flash or use_fused) else cap

    # Phased cache reads (_phased_cache_k docstring): the XLA batched
    # decode allocates the FULL-capacity cache once at prefill and runs
    # early phases as programs that statically slice a shorter key prefix
    # into the attention dots (read_len) — per-step KV bandwidth tracks the
    # live prefix, with NO migration (the round-4 grow_cache zero-pad held
    # old+new caches live at each boundary, the q4ah b32/1000-cap crash
    # vector). flash/fused walk [start, pos] slabs and read no dead
    # capacity (phasing buys nothing there). Mesh-compatible: the static
    # slice rides GSPMD (rows stay sharded on dp; tests/test_parallel.py).
    phase_totals = [total]
    k_ph = _phased_cache_k(cap - p_len)
    if (k_ph >= 2 and not use_flash and not use_fused
            # the deferred stacked insert reads the whole cache plus an
            # appended column — prefix reads require the eager insert, so
            # CHATTERBOX_DEFER_KV=1 decodes unphased instead of tripping
            # the read_len assert in llama.forward
            and not llama._defer_kv_enabled()
            and cap - p_len > 64):
        per = -(-(cap - p_len) // k_ph)
        phase_len = -(-per // 64) * 64
        phase_totals = []
        t = p_len
        while t < cap:
            t = min(t + phase_len, cap)
            phase_totals.append(t)
    read0 = phase_totals[0] if len(phase_totals) > 1 else None

    key_valid = None
    hole = None
    if text_lens is not None and (np.asarray(text_lens) < lt).any():
        use_fused = False  # ragged rows need per-row key masks
        lens = jnp.asarray(np.asarray(text_lens), jnp.int32)
        if cfg_on:
            lens = jnp.concatenate([lens, lens])
        kidx = jnp.arange(phase_totals[-1])
        ts_col = pad + cond_width(cond, cfg)
        # key_valid masks ragged text pads for prefill (and the XLA decode /
        # alignment-spy layers); the flash decode kernel takes the same dead
        # range as a per-row [lo, hi) hole instead of a (B, total) mask
        in_text_pad = ((kidx[None, :] >= ts_col + lens[:, None])
                       & (kidx[None, :] < ts_col + lt))
        key_valid = ~in_text_pad
        if use_flash:
            hole = jnp.stack([ts_col + lens,
                              jnp.full_like(lens, ts_col + lt)], axis=1)

    # int8 KV cache (round-4 DEFAULT ON for TPU, CHATTERBOX_INT8_KV=0 kill-
    # switch): batched XLA decode is KV-bandwidth bound — halving cache
    # bytes attacks the dominant per-step term (llama.KVCache docstring has
    # the HBM arithmetic; llama._kv_int8_mode has the promotion basis). The
    # flash/fused kernels walk bf16 slabs, so they take precedence when
    # engaged (<= 2 utts), exactly where the cache is small and weights
    # dominate instead.
    kv_int8 = (llama._kv_int8_mode() > 0
               and not use_flash and not use_fused)
    if mesh is not None:
        # multi-chip serving: rows across dp, weights replicated; GSPMD
        # propagates through prefill + the decode while-loop (no collectives
        # in the hot loop)
        from ..parallel.serve import shard_generation_inputs, replicate
        # the cond arrays may be COMMITTED to one device (e.g. the
        # tokenizer's output in prepare_conditionals_with_audio_prompt) —
        # the eager context build mixes them with mesh-placed params, so
        # replicate them onto the mesh first (tiny arrays, one transfer)
        cond = replicate(mesh, cond)
        context = _pad_context(
            _build_context(params, cond, jnp.asarray(tt_np), cfg, cfg_on), pad)
        context, key_valid = shard_generation_inputs(mesh, context, key_valid)
        use_flash = False  # the Pallas kernel is single-chip only
        state = prefill(params, context, cfg, total, pad, cfg_on, dtype,
                        key_valid, kv_int8, read0)
    else:
        # ONE program for cond-embed + context + prefill (an eager context
        # build costs ~10 per-op dispatches on remote backends), with the
        # text padded to the bucket ON THE HOST (numpy — no extra device
        # dispatch) and pad as a traced operand: one compiled program per
        # (bucket, rows) pair serves every text length
        tb = jnp.asarray(np.pad(tt_np, ((0, 0), (pad, 0))))
        state = _context_prefill(params, cond, tb, key_valid, jnp.int32(pad),
                                 cfg, total, cfg_on, dtype, kv_int8, read0)
    info = dict(p_len=p_len, pad=pad, cfg_on=cfg_on, use_flash=use_flash,
                key_valid=key_valid, align_layer=align_layer,
                text_start=text_start, text_len=text_len, hole=hole,
                use_fused=use_fused, phase_totals=phase_totals,
                fused=_fused_params(params, cfg, dtype) if use_fused else None)
    global LAST_GENERATION_INFO
    LAST_GENERATION_INFO = {"use_flash": use_flash, "p_len": p_len,
                            "cache_total": phase_totals[-1], "n_utt": n_utt,
                            "alignment": align_layer is not None,
                            "use_fused": use_fused, "kv_int8": kv_int8,
                            "phase_totals": phase_totals,
                            "mesh": (dict(mesh.shape) if mesh is not None
                                     else None)}
    return state, info


# Observability for benchmarks: start_generation records its static decisions
# here (a silent flash->XLA fallback is a perf bug that must be visible).
LAST_GENERATION_INFO: dict = {}


def generate_stream(params, cond: T3Cond, text_tokens: np.ndarray, *,
                    max_new_tokens: int = 1000, temperature: float = 0.8,
                    cfg_weight: float = 0.0, repetition_penalty: float = 1.2,
                    min_p: float = 0.05, top_p: float = 1.0, stop_on_eos: bool = True,
                    seed: int = 0, block: int = DECODE_BLOCK,
                    text_lens: np.ndarray | None = None, mesh=None,
                    alignment: bool = False,
                    cfg: T3Config = T3Config(), dtype=jnp.float32):
    """Yield numpy blocks of generated speech-token ids as they decode.

    The final block includes the terminating EOS when produced (the reference
    also returns EOS in `predicted`, t3.py:389-391).
    """
    state, info = start_generation(params, cond, text_tokens,
                                   cfg_weight=cfg_weight, text_lens=text_lens,
                                   mesh=mesh, max_new_tokens=max_new_tokens,
                                   alignment=alignment, cfg=cfg, dtype=dtype)
    n_utt = np.atleast_2d(text_tokens).shape[0]
    sp = SamplingParams(_sampling_param(temperature, n_utt),
                        _sampling_param(cfg_weight, n_utt),
                        _sampling_param(repetition_penalty, n_utt),
                        _sampling_param(min_p, n_utt))
    top_p_v = _sampling_param(top_p, n_utt)
    use_top_p = bool(np.any(np.asarray(top_p, np.float32) < 1.0))
    key = jax.random.PRNGKey(seed)
    limit = jnp.int32(max_new_tokens)
    single = n_utt == 1
    produced = 0
    phases = info["phase_totals"]
    phase_i = 0
    while produced < max_new_tokens:
        blk = int(block)
        read_len = None
        if len(phases) > 1:
            # phased cache reads: decode only up to this phase's prefix,
            # then step to the next phase's compiled program (same cache
            # buffer — read_len is a static slice, there is NO migration).
            # produced == state.i (each executed body step emits exactly one
            # token), so no extra device fetch. The last phase passes None
            # and shares the unphased program.
            room = phases[phase_i] - info["p_len"] - produced
            if room <= 0:
                phase_i += 1
                room = phases[phase_i] - info["p_len"] - produced
            blk = min(blk, int(room))
            if phase_i < len(phases) - 1:
                read_len = phases[phase_i]
        state, tokens, n_new = decode_block(
            params, state, key, sp, top_p_v, limit, cfg, blk,
            info["p_len"], info["pad"], info["cfg_on"], use_top_p, stop_on_eos,
            info["use_flash"], dtype, info["key_valid"],
            align_layer=info["align_layer"], text_start=info["text_start"],
            text_len=info["text_len"], hole=info["hole"],
            use_fused=info["use_fused"], fused=info["fused"],
            read_len=read_len)
        n = int(n_new)
        if n > 0:
            out = np.asarray(tokens)[:n]
            yield out[:, 0] if single else out
        produced += n
        if n == 0 or bool(np.all(np.asarray(state.done))):
            break


def generate_batch(params, cond: T3Cond, text_tokens: np.ndarray, *,
                   max_new_tokens: int = 1000, temperature: float = 0.8,
                   cfg_weight: float = 0.0, repetition_penalty: float = 1.2,
                   min_p: float = 0.05, top_p: float = 1.0, stop_on_eos: bool = True,
                   seed: int = 0, text_lens: np.ndarray | None = None, mesh=None,
                   alignment: bool = False, block: int = DECODE_BLOCK,
                   cfg: T3Config = T3Config(), dtype=jnp.float32):
    """Batched generation: U utterances sharing one voice, decoded in lock-step
    with per-row sampling/EOS. Returns a list of U 1-D id arrays (EOS incl.).

    temperature / cfg_weight / repetition_penalty / min_p / top_p accept
    either one scalar for every row or a length-U array with per-utterance
    values (the long-text path batches story chunks that each carry their own
    adaptive parameters).

    This is the throughput path for the "batch of sentences, one cached
    voice" serving config (the reference is hard-limited to batch 1 —
    SURVEY.md §2.6); on TPU the fused 2U-row decode amortises the 0.5B
    weight streaming across the whole batch.

    Single-chip decode is capped at max_decode_utterances() per fused
    program (the v5e HBM fence at 64 bf16 CFG rows — PERF_NOTES.md B=64
    study; the int8 KV cache doubles the cap to 32 utts); larger batches
    are processed in sequential sub-batches. For true large-batch scaling
    use `mesh=` (dp sharding across chips).
    """
    tt = np.atleast_2d(text_tokens)
    # mirror start_generation's capacity so the sub-batch split lands under
    # the KV-bytes fence (at the reference's 1000-token cap a batch of 32
    # becomes two sub-batches of 16)
    _cfg_on = bool(np.any(np.asarray(cfg_weight, np.float32) > 0.0))
    _cap = (min(_bucket(tt.shape[1]), cfg.max_text_seq_len)
            + cond_width(cond, cfg) + 1 + (1 if _cfg_on else 0)
            + max(max_new_tokens, DECODE_BLOCK))
    cap_utt = max_decode_utterances(_cap, rows_per_utt=2 if _cfg_on else 1,
                                    cfg=cfg)
    if mesh is None and tt.shape[0] > cap_utt:
        def _slice(v, s0, s1):
            a = np.asarray(v, np.float32)
            return v if a.ndim == 0 else a[s0:s1]
        emo = np.asarray(cond.emotion_adv, np.float32).reshape(-1)
        u_all = tt.shape[0]
        outs = []
        for s0 in range(0, tt.shape[0], cap_utt):
            s1 = min(tt.shape[0], s0 + cap_utt)
            sub_cond = cond
            if emo.size == u_all:
                sub_cond = sub_cond._replace(emotion_adv=jnp.asarray(emo[s0:s1]))
            # multi-voice rows: slice every per-row conditioning field
            if np.ndim(cond.speaker_emb) >= 2 and cond.speaker_emb.shape[0] == u_all:
                sub_cond = sub_cond._replace(
                    speaker_emb=cond.speaker_emb[s0:s1])
            cps = cond.cond_prompt_speech_tokens
            if cps is not None and cps.shape[0] == u_all:
                sub_cond = sub_cond._replace(
                    cond_prompt_speech_tokens=cps[s0:s1])
            outs.extend(generate_batch(
                params, sub_cond, tt[s0:s1], max_new_tokens=max_new_tokens,
                temperature=_slice(temperature, s0, s1),
                cfg_weight=_slice(cfg_weight, s0, s1),
                repetition_penalty=_slice(repetition_penalty, s0, s1),
                min_p=_slice(min_p, s0, s1), top_p=_slice(top_p, s0, s1),
                stop_on_eos=stop_on_eos, seed=seed + s0,
                text_lens=None if text_lens is None else np.asarray(text_lens)[s0:s1],
                alignment=alignment, block=block, cfg=cfg, dtype=dtype))
        # observability: the fence split must be visible in bench JSONs (an
        # unobserved sub-batching is indistinguishable from one big decode)
        LAST_GENERATION_INFO["decode_sub_batches"] = -(-tt.shape[0] // cap_utt)
        LAST_GENERATION_INFO["decode_sub_batch_utts"] = cap_utt
        return outs
    blocks = list(generate_stream(
        params, cond, text_tokens, max_new_tokens=max_new_tokens,
        temperature=temperature, cfg_weight=cfg_weight,
        repetition_penalty=repetition_penalty, min_p=min_p, top_p=top_p,
        stop_on_eos=stop_on_eos, seed=seed, text_lens=text_lens, mesh=mesh,
        alignment=alignment, block=block, cfg=cfg, dtype=dtype))
    u = np.atleast_2d(text_tokens).shape[0]
    if not blocks:
        return [np.zeros((0,), np.int32)] * u
    # generate_stream squeezes the utterance axis for U=1; restore it
    all_tok = np.concatenate([b.reshape(b.shape[0], -1) for b in blocks], axis=0)
    outs = []
    for col in range(u):
        seq = all_tok[:, col]
        eos_pos = np.nonzero(seq == cfg.stop_speech_token)[0]
        end = int(eos_pos[0]) + 1 if eos_pos.size else seq.shape[0]
        outs.append(seq[:end])
    return outs


def generate(params, cond: T3Cond, text_tokens: np.ndarray, *,
             max_new_tokens: int = 1000, temperature: float = 0.8,
             cfg_weight: float = 0.0, repetition_penalty: float = 1.2,
             min_p: float = 0.05, top_p: float = 1.0, stop_on_eos: bool = True,
             seed: int = 0, block: int | None = None, alignment: bool = False,
             mesh=None, cfg: T3Config = T3Config(), dtype=jnp.float32) -> np.ndarray:
    """Generate speech tokens for one utterance (reference: t3.py:204-391).

    text_tokens: (1, T) already wrapped in SOT/EOT. Returns the generated ids
    INCLUDING the terminating EOS if produced (reference returns `predicted`
    which also includes EOS). `block` tunes the decode-block size: larger
    blocks mean fewer host round-trips (use max_new_tokens when latency to
    the device is high), smaller blocks stop closer to EOS. `mesh` with a tp
    axis + parallel.shard_t3_for_decode(params) runs the decode
    tensor-parallel (per-step weight streaming divided across chips).
    """
    blocks = list(generate_stream(
        params, cond, text_tokens, max_new_tokens=max_new_tokens,
        temperature=temperature, cfg_weight=cfg_weight,
        repetition_penalty=repetition_penalty, min_p=min_p, top_p=top_p,
        stop_on_eos=stop_on_eos, seed=seed, block=block or DECODE_BLOCK,
        alignment=alignment, mesh=mesh, cfg=cfg, dtype=dtype))
    if not blocks:
        return np.zeros((0,), np.int32)
    return np.concatenate(blocks)
