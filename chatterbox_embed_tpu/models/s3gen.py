"""S3Gen: S3 speech tokens -> mel (CFM) -> waveform (HiFT-GAN), plus the
voice-reference embedding path and the `.npy` VoiceProfile format
(reference: models/s3gen/s3gen.py:47-470, flow.py:175-282).

TPU design: `token_to_wav` is ONE jittable graph — token embed, conformer,
CFM scan, vocoder — traced per (token-bucket) shape. Reference audio
embedding (mel + CAMPPlus + tokenizer) is likewise a single jitted function.
Host code only does numpy I/O and bucket padding.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import (S3GenConfig, S3_SR, S3GEN_SR, SPEECH_VOCAB_SIZE)
from ..ops import mel as mel_ops
from ..ops import resample as resample_ops
from . import layers as L
from . import conformer, flow_decoder, cfm, hifigan, xvector, s3tokenizer


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------

def init(key, cfg: S3GenConfig = S3GenConfig()):
    k = L.split_keys(key, 8)
    flow = {
        "input_embedding": L.embedding_init(k[0], cfg.flow.vocab_size, cfg.flow.input_size,
                                            std=0.02),
        "spk_embed_affine": L.linear_init(k[1], cfg.flow.spk_embed_dim, cfg.flow.output_size),
        "encoder": conformer.init(k[2], cfg.flow.encoder),
        "encoder_proj": L.linear_init(k[3], cfg.flow.encoder.output_size, cfg.flow.output_size),
        "decoder": flow_decoder.init(k[4], cfg.flow.decoder),
    }
    return {
        "flow": flow,
        "hift": hifigan.init(k[5], cfg.hift),
        "speaker_encoder": xvector.init(k[6], cfg.campplus),
        "tokenizer": s3tokenizer.init(k[7], cfg.tokenizer),
    }


# ---------------------------------------------------------------------------
# flow inference: tokens -> mel
# ---------------------------------------------------------------------------

def _flow_to_mel_impl(params, tokens: jnp.ndarray, token_len: jnp.ndarray,
                      prompt_tokens: jnp.ndarray, prompt_feat: jnp.ndarray,
                      embedding: jnp.ndarray, finalize: bool = True,
                      cfg: S3GenConfig = S3GenConfig(), dtype=jnp.float32,
                      prompt_len: Optional[jnp.ndarray] = None,
                      cache_every=None, cfg_steps=None):
    """CausalMaskedDiffWithXvec.inference (reference: flow.py:236-282).

    Args:
      tokens:        (B, T_tok) target speech tokens (prompt already removed)
      token_len:     (B,) valid lengths of [prompt; target]
      prompt_tokens: (B, T_p) reference speech tokens
      prompt_feat:   (B, T_mel_p, 80) reference mel (mel-rate = 2 x token-rate)
      embedding:     (B, 192) CAMPPlus x-vector
      prompt_len:    optional (B,) valid prompt lengths for MULTI-VOICE
                     batches (rows carry different reference prompts padded
                     to a common T_p). None (default) keeps the static
                     shared-prompt layout bit-exactly.
    Returns (B, 2*T_tok(-lookahead), 80) fp32 mel for the generated part only.
    """
    fl = params["flow"]
    # xvec projection on L2-normalised embedding (flow.py:251-253)
    emb = embedding / jnp.linalg.norm(embedding, axis=-1, keepdims=True)
    spks = L.linear(fl["spk_embed_affine"], emb.astype(jnp.float32))

    if prompt_len is None:
        full = jnp.concatenate([prompt_tokens, tokens], axis=1)
    else:
        # ragged prompts: row b is [prompt_b(:p_b); generated_b; pad] — a
        # gather keeps each row contiguous (no pad hole between prompt and
        # generated tokens, which would shift conformer positions per row)
        assert finalize, "ragged prompts: streaming windows are single-voice"
        p_max, t_gen = prompt_tokens.shape[1], tokens.shape[1]
        j = jnp.arange(p_max + t_gen)[None]                    # (1, t)
        pl = prompt_len[:, None]                               # (B, 1)
        b_rows = prompt_tokens.shape[0]
        pidx = jnp.broadcast_to(jnp.clip(j, 0, p_max - 1),
                                (b_rows, j.shape[1]))
        gidx = jnp.clip(j - pl, 0, t_gen - 1)
        full = jnp.where(j < pl,
                         jnp.take_along_axis(prompt_tokens, pidx, axis=1),
                         jnp.take_along_axis(tokens, gidx, axis=1))
    t = full.shape[1]
    mask = (jnp.arange(t)[None] < token_len[:, None])
    x = L.embedding(fl["input_embedding"], jnp.clip(full, 0, None))
    x = x * mask[..., None].astype(x.dtype)

    h = conformer.forward(fl["encoder"], x, token_len, cfg.flow.encoder, dtype)
    if not finalize:
        h = h[:, : -cfg.flow.pre_lookahead_len * cfg.flow.token_mel_ratio]
    mel_len1 = prompt_feat.shape[1]
    h = L.linear(fl["encoder_proj"], h.astype(jnp.float32))

    conds = jnp.zeros((h.shape[0], h.shape[1], cfg.flow.output_size), h.dtype)
    if prompt_len is None:
        conds = conds.at[:, :mel_len1].set(prompt_feat)
    else:
        # per-row prompt frames: positions m < 2*p_b carry the reference mel
        m = jnp.arange(h.shape[1])[None]
        pf = jnp.pad(prompt_feat.astype(h.dtype),
                     ((0, 0), (0, h.shape[1] - mel_len1), (0, 0)))
        mel_pl = cfg.flow.token_mel_ratio * prompt_len[:, None]
        conds = jnp.where((m < mel_pl)[..., None], pf, conds)

    # mel-rate validity mask: bucket padding must not leak into valid frames
    mel_valid = cfg.flow.token_mel_ratio * token_len
    if not finalize:
        mel_valid = mel_valid - cfg.flow.pre_lookahead_len * cfg.flow.token_mel_ratio
    mel_mask = (jnp.arange(h.shape[1])[None, :] < mel_valid[:, None])[..., None]
    mel_mask = mel_mask.astype(h.dtype)

    mel = cfm.generate_mel(fl["decoder"], h, spks, conds, mask=mel_mask,
                           cfm=cfg.flow.cfm, dec_cfg=cfg.flow.decoder,
                           dtype=dtype, cache_every=cache_every,
                           cfg_steps=cfg_steps)
    if prompt_len is None:
        return mel[:, mel_len1:]
    # realign: row b's generated frames start at 2*p_b
    t_gen2 = cfg.flow.token_mel_ratio * tokens.shape[1]
    m2 = jnp.arange(t_gen2)[None] + cfg.flow.token_mel_ratio * prompt_len[:, None]
    m2 = jnp.clip(m2, 0, mel.shape[1] - 1)
    return jnp.take_along_axis(mel, m2[..., None], axis=1)


_flow_to_mel_jit = jax.jit(_flow_to_mel_impl,
                           static_argnames=("finalize", "cfg", "dtype",
                                            "cache_every", "cfg_steps"))


def flow_to_mel(params, tokens, token_len, prompt_tokens, prompt_feat,
                embedding, finalize: bool = True,
                cfg: S3GenConfig = S3GenConfig(), dtype=jnp.float32,
                prompt_len=None, cache_every=None, cfg_steps=None):
    """Jitted tokens->mel (one program per (bucket, prompt, finalize) shape;
    eager tracing would cost hundreds of dispatches on remote backends)."""
    return _flow_to_mel_jit(params, tokens, token_len, prompt_tokens,
                            prompt_feat, embedding, finalize, cfg, dtype,
                            prompt_len, cache_every, cfg_steps)


def _flow_to_mel_window_impl(params, tokens: jnp.ndarray, vlen: jnp.ndarray,
                             prompt_tokens: jnp.ndarray, prompt_feat: jnp.ndarray,
                             embedding: jnp.ndarray, mu_pin: jnp.ndarray,
                             pin_frames: jnp.ndarray, noise_off: jnp.ndarray,
                             finalize: bool, cfg: S3GenConfig, dtype):
    """Windowed streaming flow: O(prompt + window) per call instead of the
    recompute-everything O(n) (round-1 stream_generate was O(n^2) overall).

    The window holds the LAST `vlen` generated tokens left-aligned in a
    static (B, W) buffer: [C context tokens; new tokens]. Continuity across
    windows comes from three pins (mirroring the intent of the reference's
    flow_cache, flow_matching.py:58-65):
      - the prompt prefix rides along in every window (voice conditioning);
      - `mu_pin` overwrites the first `pin_frames` generated-region mu frames
        with the previous window's values, so frames that are already
        emitted keep the exact conditioning they were emitted with;
      - CFM noise is indexed at ABSOLUTE frame positions (noise_off).

    Returns (mel_gen (B, 2*W, 80) for the generated region, mu_tail
    (B, PIN, 80) to pin the next window; PIN = mu_pin.shape[1]).
    """
    fl = params["flow"]
    r = cfg.flow.token_mel_ratio
    emb = embedding / jnp.linalg.norm(embedding, axis=-1, keepdims=True)
    spks = L.linear(fl["spk_embed_affine"], emb.astype(jnp.float32))

    full = jnp.concatenate([prompt_tokens, tokens], axis=1)
    p_tok = prompt_tokens.shape[1]
    t = full.shape[1]
    token_len = p_tok + vlen
    mask = (jnp.arange(t)[None] < token_len[:, None])
    x = L.embedding(fl["input_embedding"], jnp.clip(full, 0, None))
    x = x * mask[..., None].astype(x.dtype)

    h = conformer.forward(fl["encoder"], x, token_len, cfg.flow.encoder, dtype)
    mel_len1 = prompt_feat.shape[1]
    mu = L.linear(fl["encoder_proj"], h.astype(jnp.float32))

    # pin previously-emitted conditioning over the context region
    pin_max = mu_pin.shape[1]
    gen_idx = jnp.arange(mu.shape[1]) - mel_len1
    pin_mask = (gen_idx >= 0) & (gen_idx < pin_frames)
    pick = jnp.clip(gen_idx, 0, pin_max - 1)
    mu = jnp.where(pin_mask[None, :, None], mu_pin[:, pick], mu)

    conds = jnp.zeros_like(mu)
    conds = conds.at[:, :mel_len1].set(prompt_feat)

    mel_valid = r * token_len
    if not finalize:
        mel_valid = mel_valid - r * cfg.flow.pre_lookahead_len
    mel_mask = (jnp.arange(mu.shape[1])[None, :] < mel_valid[:, None])[..., None]
    mel_mask = mel_mask.astype(mu.dtype)

    mel = cfm.generate_mel_stream(fl["decoder"], mu, spks, conds, mel_mask,
                                  prompt_frames=mel_len1, noise_off=noise_off,
                                  cfm=cfg.flow.cfm, dec_cfg=cfg.flow.decoder,
                                  dtype=dtype)
    # mu tail for the next window's pin: frames of tokens
    # [vlen - C, vlen - C + PIN/r) where C = PIN/r + lookahead holdback
    tail_start = (mel_len1 + r * vlen.reshape(-1)[0]
                  - pin_max - r * cfg.flow.pre_lookahead_len)
    mu_tail = jax.lax.dynamic_slice_in_dim(mu, jnp.maximum(tail_start, 0),
                                           pin_max, axis=1)
    return mel[:, mel_len1:], mu_tail


_flow_to_mel_window_jit = jax.jit(
    _flow_to_mel_window_impl, static_argnames=("finalize", "cfg", "dtype"))


def flow_to_mel_window(params, tokens, vlen, prompt_tokens, prompt_feat,
                       embedding, mu_pin, pin_frames, noise_off,
                       finalize: bool = False,
                       cfg: S3GenConfig = S3GenConfig(), dtype=jnp.float32):
    """Jitted windowed streaming flow (one program per (W, prompt) shape)."""
    return _flow_to_mel_window_jit(params, tokens, vlen, prompt_tokens,
                                   prompt_feat, embedding, mu_pin,
                                   jnp.asarray(pin_frames, jnp.int32),
                                   jnp.asarray(noise_off, jnp.int32),
                                   finalize, cfg, dtype)


# ---------------------------------------------------------------------------
# full graph: tokens -> wav
# ---------------------------------------------------------------------------

def trim_fade(sr: int = S3GEN_SR) -> np.ndarray:
    """20 ms silence + 20 ms cosine fade-in (reference: s3gen.py:283-287)."""
    n = sr // 50
    fade = np.zeros(2 * n, np.float32)
    fade[n:] = (np.cos(np.linspace(np.pi, 0.0, n)) + 1.0) / 2.0
    return fade


def _token_to_wav_impl(params, tokens, token_len, prompt_tokens, prompt_feat,
                       embedding, key, finalize: bool,
                       cfg: S3GenConfig, dtype, apply_fade: bool,
                       prompt_len=None, cache_every=None, cfg_steps=None):
    mel = _flow_to_mel_impl(params, tokens, token_len, prompt_tokens, prompt_feat,
                            embedding, finalize, cfg, dtype,
                            prompt_len=prompt_len, cache_every=cache_every,
                            cfg_steps=cfg_steps)
    wav, _src = hifigan.inference(params["hift"], mel, key=key, cfg=cfg.hift, dtype=dtype)
    if apply_fade:
        fade = jnp.asarray(trim_fade())
        wav = wav.at[:, : fade.shape[0]].multiply(fade)
    return wav


_token_to_wav_jit = jax.jit(_token_to_wav_impl,
                            static_argnames=("finalize", "cfg", "dtype",
                                             "apply_fade", "cache_every",
                                             "cfg_steps"))


def token_to_wav(params, tokens, token_len, prompt_tokens, prompt_feat,
                 embedding, key=None, finalize: bool = True,
                 cfg: S3GenConfig = S3GenConfig(), dtype=jnp.float32,
                 apply_fade: bool = True, prompt_len=None, cache_every=None,
                 cfg_steps=None):
    """S3Token2Wav.inference (reference: s3gen.py:332-350). Returns (B, T_wav).

    ONE jitted program per (token-bucket, prompt) shape: on remote-dispatch
    backends an un-jitted trace costs hundreds of host round-trips.
    `prompt_len` (B,) enables MULTI-VOICE rows whose reference prompts are
    padded to a common width (see _flow_to_mel_impl)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    return _token_to_wav_jit(params, tokens, token_len, prompt_tokens, prompt_feat,
                             embedding, key, finalize, cfg, dtype, apply_fade,
                             prompt_len, cache_every, cfg_steps)


# ---------------------------------------------------------------------------
# reference embedding (host-orchestrated, device-computed)
# ---------------------------------------------------------------------------

def embed_ref(params, ref_wav: np.ndarray, ref_sr: int,
              cfg: S3GenConfig = S3GenConfig()) -> Dict[str, np.ndarray]:
    """Build the reference dict for voice cloning (reference: s3gen.py:155-208).

    Returns numpy arrays shaped exactly like the reference's ref_dict so the
    `.npy` VoiceProfile format round-trips bit-for-bit.
    """
    ref_wav = np.asarray(ref_wav, np.float32).reshape(1, -1)
    wav24 = ref_wav if ref_sr == S3GEN_SR else np.asarray(
        resample_ops.resample(jnp.asarray(ref_wav), ref_sr, S3GEN_SR))
    # pad to a whole mel hop so mel frames == 2 * tokens
    hop = cfg.mel_hop
    if wav24.shape[1] % hop:
        wav24 = np.pad(wav24, ((0, 0), (0, hop - wav24.shape[1] % hop)))
    mel24 = np.asarray(mel_ops.mel_spectrogram_24k(
        jnp.asarray(wav24), n_fft=cfg.mel_n_fft, num_mels=cfg.mel_num,
        hop_size=cfg.mel_hop, win_size=cfg.mel_win, fmin=cfg.mel_fmin,
        fmax=cfg.mel_fmax))
    mel24 = np.swapaxes(mel24, 1, 2)                     # (1, T_mel, 80)

    wav16 = ref_wav if ref_sr == S3_SR else np.asarray(
        resample_ops.resample(jnp.asarray(ref_wav), ref_sr, S3_SR))
    x_vector = np.asarray(xvector.inference(params["speaker_encoder"], jnp.asarray(wav16),
                                            cfg.campplus))
    wav16p = s3tokenizer.pad_to_token_multiple(wav16)
    tokens, tok_lens = s3tokenizer.tokenize_wave(params["tokenizer"], jnp.asarray(wav16p),
                                                 cfg=cfg.tokenizer)
    tokens, tok_lens = np.asarray(tokens), np.asarray(tok_lens)
    if mel24.shape[1] != 2 * tokens.shape[1]:            # (s3gen.py:192-200)
        n = mel24.shape[1] // 2
        tokens = tokens[:, :n]
        tok_lens = np.minimum(tok_lens, n)
    return dict(
        prompt_token=tokens.astype(np.int64),
        prompt_token_len=tok_lens.astype(np.int64),
        prompt_feat=mel24.astype(np.float32),
        prompt_feat_len=None,
        embedding=x_vector.astype(np.float32),
    )


# ---------------------------------------------------------------------------
# VoiceProfile (.npy) — byte-compatible with the reference
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class VoiceProfile:
    """Dict-in-npy voice profile (reference: s3gen.py:427-470; the fork adds
    ve_embedding — tts.py:510-549)."""
    embedding: np.ndarray
    prompt_feat: Optional[np.ndarray] = None
    prompt_feat_len: Optional[int] = None
    prompt_token: Optional[np.ndarray] = None
    prompt_token_len: Optional[np.ndarray] = None
    ve_embedding: Optional[np.ndarray] = None

    def save(self, path: str):
        data = {"embedding": np.asarray(self.embedding)}
        if self.prompt_feat is not None:
            data["prompt_feat"] = np.asarray(self.prompt_feat)
        if self.prompt_feat_len is not None:
            data["prompt_feat_len"] = self.prompt_feat_len
        if self.prompt_token is not None:
            data["prompt_token"] = np.asarray(self.prompt_token)
        if self.prompt_token_len is not None:
            data["prompt_token_len"] = np.asarray(self.prompt_token_len)
        if self.ve_embedding is not None:
            data["ve_embedding"] = np.asarray(self.ve_embedding)
        np.save(path, data)

    @classmethod
    def load(cls, path: str) -> "VoiceProfile":
        data = np.load(path, allow_pickle=True).item()
        return cls(
            embedding=data["embedding"],
            prompt_feat=data.get("prompt_feat"),
            prompt_feat_len=data.get("prompt_feat_len"),
            prompt_token=data.get("prompt_token"),
            prompt_token_len=data.get("prompt_token_len"),
            ve_embedding=data.get("ve_embedding"),
        )


def save_voice_clone(params, ref_wav: np.ndarray, ref_sr: int, save_path: str,
                     cfg: S3GenConfig = S3GenConfig()):
    """192-d CAMPPlus embedding -> .npy (reference: s3gen.py:108-119)."""
    wav = np.asarray(ref_wav, np.float32).reshape(1, -1)
    wav16 = wav if ref_sr == S3_SR else np.asarray(
        resample_ops.resample(jnp.asarray(wav), ref_sr, S3_SR))
    emb = np.asarray(xvector.inference(params["speaker_encoder"], jnp.asarray(wav16),
                                       cfg.campplus))
    np.save(save_path, emb)
    return emb


def save_voice_profile(params, ref_wav: np.ndarray, ref_sr: int, save_path: str,
                       cfg: S3GenConfig = S3GenConfig()):
    """Full profile -> .npy (reference: s3gen.py:121-143)."""
    rd = embed_ref(params, ref_wav, ref_sr, cfg)
    VoiceProfile(
        embedding=rd["embedding"], prompt_feat=rd["prompt_feat"],
        prompt_feat_len=rd["prompt_feat_len"], prompt_token=rd["prompt_token"],
        prompt_token_len=rd["prompt_token_len"],
    ).save(save_path)


def drop_invalid_tokens(x: np.ndarray) -> np.ndarray:
    """Keep only real speech codes < 6561 (reference: s3gen.py:36-38)."""
    x = np.asarray(x).reshape(-1)
    return x[x < SPEECH_VOCAB_SIZE]
