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

# Windowed-streaming geometry, shared with ChatterboxTTS.stream_generate
# (the fused first chunk and the host loop MUST agree on the context width
# or the mu_tail pin silently drifts). Env-overridable for operators whose
# voice/model needs a wider context — sensitivity evidence for the defaults
# lives in PERF_NOTES.md (scripts/stream_geometry_sensitivity.py); both are
# read ONCE at import time (set them before importing the package).
import os as _os
STREAM_CTX_TOKENS = int(_os.getenv("CHATTERBOX_STREAM_CTX", "6"))      # C (> pre-lookahead 3)
STREAM_VOC_CTX_MEL = int(_os.getenv("CHATTERBOX_STREAM_VOC_CTX", "8"))  # M (covers conv fields)


class FirstChunk(NamedTuple):
    state: t3_mod.DecodeState     # resumable T3 decode state
    tokens: jnp.ndarray           # (block, 1) generated ids
    n_new: jnp.ndarray            # () tokens actually generated
    wav: jnp.ndarray              # (1, r*(block+look)*480) padded waveform
    n_valid_mel: jnp.ndarray      # () valid mel frames in `wav`
    mu_tail: jnp.ndarray          # (1, PIN, 80) flow continuity tail
    mel_tail: jnp.ndarray         # (1, M, 80) vocoder context tail
    phase_carry: jnp.ndarray      # (1, nh+1) harmonic phase carry


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "block", "total", "use_flash", "use_top_p",
                     "voc_ctx", "dtype", "use_fused"))
def _first_chunk_impl(t3_params, s3_params, cond, text_tokens, key, sp, top_p,
                      limit, prompt_tokens, prompt_feat, embedding, phase_key,
                      pad, cfg: ChatterboxConfig, block: int, total: int,
                      use_flash: bool, use_top_p: bool, voc_ctx: int, dtype,
                      use_fused: bool = False, fused=None):
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
        t3_params, state, key, sp, top_p, limit, t3c, block,
        p_len, pad, True, use_top_p, True, use_flash, dtype, None, None,
        None, None, use_fused=use_fused, fused=fused)

    # --- flow window (first window: no context, absolute frame 0)
    win = jnp.swapaxes(tokens, 0, 1)                       # (1, block)
    # valid tokens exclude EOS (and any id >= flow vocab): the host loop
    # filters them before synthesis, so the fused window must too — an EOS
    # inside the first block must not condition the flow on a spurious pad id
    tok_idx = jnp.arange(block)
    valid_tok = (tok_idx < n_new) & (win[0] < s3c.flow.vocab_size)
    n_valid_tok = jnp.sum(valid_tok.astype(jnp.int32))
    win = jnp.where(win >= s3c.flow.vocab_size, 0, win)    # EOS slot -> pad id
    vlen = jnp.maximum(n_valid_tok, 1)[None]
    pin = r * (STREAM_CTX_TOKENS - look)
    mu_pin0 = jnp.zeros((1, pin, s3c.mel_num), jnp.float32)
    mel_gen, mu_tail = s3gen_mod._flow_to_mel_window_impl(
        s3_params, win, vlen, prompt_tokens, prompt_feat, embedding,
        mu_pin0, jnp.int32(0), jnp.int32(0), False, s3c, dtype)

    # --- vocoder window over the emittable frames. The window matches the
    # host loop's first window EXACTLY — emittable frames then zeros out to
    # the r*(block+look) width. Identical widths keep the per-window noise
    # draws identical and identical masking keeps conv receptive fields
    # identical, so the fused first chunk is bit-comparable to the unfused
    # stream_generate loop (tested in test_streaming_fidelity.py).
    n_valid = r * jnp.maximum(n_valid_tok - look, 0)
    new_cap = r * (block + look)
    frame_idx = jnp.arange(r * block)
    mel_emit = mel_gen[:, : r * block] * (frame_idx[None, :, None] < n_valid)
    mel_win = jnp.pad(mel_emit, ((0, 0), (0, new_cap - r * block), (0, 0)))
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
                top_p: float = 1.0, seed: int = 0,
                voc_ctx: int = STREAM_VOC_CTX_MEL,
                cfg: ChatterboxConfig = ChatterboxConfig(),
                dtype=jnp.float32) -> tuple[FirstChunk, dict]:
    """Synthesize the first `block_tokens` of speech in one dispatch.

    Returns (FirstChunk, resume): `wav[0, : n_valid_mel*480]` is the
    emittable audio; `resume` carries everything `continue_tokens` needs to
    keep decoding from the returned DecodeState (same compiled decode-block
    program family as t3.generate_stream). CFG is always on (cfg_weight > 0
    is the deployed configuration)."""
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
    use_fused = False
    if (t3_mod._use_fused_step()
            and "w" in t3_params["llama"]["layers"][0]["q"]):  # not int8
        from .kernels.fused_decode import plan as _fused_plan
        use_fused = _fused_plan(cfg.t3.llama, 2) is not None   # CFG pair
    fused = (t3_mod._fused_params(t3_params, cfg.t3, dtype)
             if use_fused else None)
    total = -(-cap // 256) * 256 if (use_flash or use_fused) else cap
    use_top_p = float(np.asarray(top_p)) < 1.0
    sp = t3_mod.SamplingParams(jnp.float32(temperature), jnp.float32(cfg_weight),
                               jnp.float32(repetition_penalty), jnp.float32(min_p))
    key = jax.random.PRNGKey(seed)
    limit = jnp.int32(max_new_tokens)
    top_p_v = jnp.float32(top_p)
    fc = _first_chunk_impl(
        t3_params, s3_params, cond, text_tokens, key, sp, top_p_v,
        limit, prompt_tokens, prompt_feat, embedding,
        jax.random.PRNGKey(seed), jnp.int32(pad), cfg, block_tokens, total,
        use_flash, use_top_p, voc_ctx, dtype, use_fused=use_fused, fused=fused)
    resume = dict(key=key, sp=sp, top_p=top_p_v, use_top_p=use_top_p,
                  limit=limit, p_len=p_len, pad=pad, use_flash=use_flash,
                  block=block_tokens, max_new_tokens=max_new_tokens,
                  use_fused=use_fused, fused=fused)
    t3_mod.LAST_GENERATION_INFO = {"use_flash": use_flash, "p_len": p_len,
                                   "cache_total": total, "n_utt": 1,
                                   "fused_first_chunk": True,
                                   "use_fused": use_fused}
    return fc, resume


class WindowedSynth:
    """Incremental flow + vocoder tail over a stream of speech-token blocks.

    Exactly the windowed synthesis loop of ChatterboxTTS.stream_generate
    (which now delegates here), factored out so ANY token source can stream
    audio — the lock-step decode or a continuous-batching engine slot
    (serving/continuous.py streamed requests, round-5 VERDICT item 4):
    - the flow runs on [prompt; last C tokens; new tokens] with mu pinned
      over already-emitted frames and CFM noise indexed at absolute frame
      positions (s3gen.flow_to_mel_window);
    - the vocoder synthesises [M context mel frames; new frames] with a
      phase-continuous harmonic source (hifigan.stream_synthesize);
    - synthesis groups follow the doubling schedule block_tokens ->
      throughput_block_tokens, so identical feeds produce identical windows
      (and identical audio) regardless of how the tokens were batched in.

    feed() takes a raw decoded block (EOS/invalid ids are filtered here) and
    returns the wav chunks that became emittable; finish() flushes the final
    window (lookahead included). seed_from_fused() resumes from the fused
    first-chunk program's carries, exactly as stream_generate's fused path.

    Reference parity anchors: the upstream flow exposes the same windowed
    hooks but leaves them unwired (finalize/pre-lookahead handling in
    /root/reference/src/chatterbox/models/s3gen/flow.py:262-263; vocoder
    cache_source carry in .../s3gen/hifigan.py:470-472) — this class is the
    TPU-native composition of those hooks with static shape buckets.
    """

    def __init__(self, s3gen_params, prompt_token, prompt_feat, embedding, *,
                 phase_key, cfg: ChatterboxConfig = ChatterboxConfig(),
                 dtype=jnp.float32, block_tokens: int = 25,
                 throughput_block_tokens: int = 300,
                 ctx_tokens: int | None = None, voc_ctx: int | None = None):
        self.p = s3gen_params
        self.prompt_token = prompt_token
        self.prompt_feat = prompt_feat
        self.embedding = embedding
        self.cfg = cfg
        self.dtype = dtype
        self.phase_key = phase_key
        self.C = STREAM_CTX_TOKENS if ctx_tokens is None else ctx_tokens
        self.M = STREAM_VOC_CTX_MEL if voc_ctx is None else voc_ctx
        s3c = cfg.s3gen
        self.r = s3c.flow.token_mel_ratio
        self.look = s3c.flow.pre_lookahead_len
        self.pin = self.r * (self.C - self.look)
        self.nmel = s3c.mel_num
        self.up = s3c.hift.total_upsample
        nh = s3c.hift.nb_harmonics + 1
        # static shape buckets: one compiled (flow, vocoder) program pair per
        # group size in the doubling schedule block_tokens -> throughput cap
        self.sizes = [block_tokens]
        while self.sizes[-1] < throughput_block_tokens:
            self.sizes.append(min(2 * self.sizes[-1], throughput_block_tokens))
        self.throughput_cap = throughput_block_tokens
        self.target = block_tokens
        self.pending = np.zeros((0,), np.int32)
        self.n = 0                                   # tokens consumed
        self.recent = np.zeros((0,), np.int32)       # last <= C tokens
        self.mu_pin = jnp.zeros((1, self.pin, self.nmel), jnp.float32)
        self.mel_tail = np.zeros((1, 0, self.nmel), np.float32)
        self.phase = jnp.zeros((1, nh), jnp.float32)
        self.first_voc = True
        self.vidx = 0

    def seed_from_fused(self, valid_tokens: np.ndarray, mu_tail, mel_tail,
                        phase_carry) -> None:
        """Resume after streaming.first_chunk synthesised the first group."""
        self.n = len(valid_tokens)
        self.recent = np.asarray(valid_tokens, np.int32)[-self.C:]
        self.mu_pin = mu_tail
        self.mel_tail = np.asarray(mel_tail, np.float32)
        self.phase = phase_carry
        self.first_voc = False
        self.vidx = 1
        self.target = min(2 * self.sizes[0], self.throughput_cap)

    def _bucket_group(self, n: int) -> int:
        for s in self.sizes:
            if n <= s:
                return s
        return self.sizes[-1]

    def _synthesize(self, group: np.ndarray, final: bool):
        """Run one flow+vocoder window over `group` new tokens."""
        r, look, C, M = self.r, self.look, self.C, self.M
        first = self.n == 0
        if first and len(group) == 0:
            return None
        ctx = self.recent if not first else np.zeros((0,), np.int32)
        gbkt = self._bucket_group(max(len(group), 1))
        width = len(ctx) + gbkt
        win = np.zeros((1, width), np.int32)
        filled = np.concatenate([ctx, group])
        win[0, :len(filled)] = filled
        vlen = len(filled)
        n0 = self.n - len(ctx)
        mel_gen, mu_tail = s3gen_mod.flow_to_mel_window(
            self.p, jnp.asarray(win), jnp.asarray([vlen]),
            self.prompt_token, self.prompt_feat, self.embedding, self.mu_pin,
            pin_frames=0 if first else self.pin, noise_off=r * n0,
            finalize=final, cfg=self.cfg.s3gen, dtype=self.dtype)
        self.mu_pin = mu_tail
        # newly emittable frames of this window's generated region
        lo = r * max(len(ctx) - look, 0)
        hi = r * (vlen if final else vlen - look)
        self.n += len(group)
        self.recent = filled[-C:]
        if hi <= lo:
            return None
        mel_new = np.asarray(mel_gen[:, lo:hi])

        # vocoder window: [M emitted context frames; new frames], padded to
        # the bucket width so programs are reused across calls
        valid_new = mel_new.shape[1]
        new_cap = r * (gbkt + look)  # final windows add the held-back lookahead
        m_eff = self.mel_tail.shape[1]
        mel_win = np.zeros((1, m_eff + new_cap, self.nmel), np.float32)
        mel_win[:, :m_eff] = self.mel_tail
        mel_win[:, m_eff:m_eff + valid_new] = mel_new
        # phase carry is read at the start of the NEXT window, which is this
        # window's valid end minus the next context width
        m_next = min(M, m_eff + valid_new)
        carry_idx = max((m_eff + valid_new - m_next) * self.up - 1, 0)
        wav_win, carry = hift_mod.stream_synthesize(
            self.p["hift"], jnp.asarray(mel_win), self.phase_key,
            jax.random.fold_in(self.phase_key, self.vidx), self.phase,
            carry_idx, cfg=self.cfg.s3gen.hift, dtype=self.dtype)
        self.phase = carry
        self.vidx += 1
        self.mel_tail = mel_win[:, max(m_eff + valid_new - M, 0):
                                m_eff + valid_new]
        chunk = np.asarray(
            wav_win[0, m_eff * self.up: (m_eff + valid_new) * self.up]).copy()
        if self.first_voc:
            fade = s3gen_mod.trim_fade()
            chunk[: fade.shape[0]] *= fade
            self.first_voc = False
        return chunk

    def feed(self, block: np.ndarray) -> list[np.ndarray]:
        """Consume one decoded token block; return newly emittable chunks."""
        from .config import SPEECH_VOCAB_SIZE
        block = np.asarray(block, np.int32).reshape(-1)
        block = block[block < SPEECH_VOCAB_SIZE]
        self.pending = np.concatenate([self.pending, block])
        chunks = []
        while len(self.pending) >= self.target:
            group, self.pending = (self.pending[:self.target],
                                   self.pending[self.target:])
            chunk = self._synthesize(group, final=False)
            self.target = min(2 * self.target, self.throughput_cap)
            if chunk is not None and chunk.size:
                chunks.append(chunk)
        return chunks

    def finish(self) -> list[np.ndarray]:
        """Flush the final window (lookahead included)."""
        chunk = self._synthesize(self.pending, final=True)
        self.pending = np.zeros((0,), np.int32)
        return [chunk] if chunk is not None and chunk.size else []


def continue_tokens(t3_params, fc: FirstChunk, resume: dict, *,
                    cfg: ChatterboxConfig = ChatterboxConfig(),
                    dtype=jnp.float32):
    """Yield further speech-token blocks from a FirstChunk's DecodeState.

    Mirrors t3.generate_stream's loop (same key/fold_in schedule, same
    compiled decode_block program per (bucket, block)), starting from the
    tokens the fused program already produced. The caller owns EOS
    filtering, exactly like generate_stream's consumers."""
    state = fc.state
    produced = int(fc.n_new)
    if bool(np.all(np.asarray(state.done))):
        return
    while produced < resume["max_new_tokens"]:
        state, tokens, n_new = t3_mod.decode_block(
            t3_params, state, resume["key"], resume["sp"], resume["top_p"],
            resume["limit"], cfg.t3, resume["block"], resume["p_len"],
            resume["pad"], True, resume["use_top_p"], True,
            resume["use_flash"], dtype, None, None, None, None,
            use_fused=resume.get("use_fused", False), fused=resume.get("fused"))
        n = int(n_new)
        if n > 0:
            yield np.asarray(tokens)[:n, 0]
        produced += n
        if n == 0 or bool(np.all(np.asarray(state.done))):
            break
