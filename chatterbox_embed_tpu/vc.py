"""ChatterboxVC: voice conversion + profile-based TTS + the voice-clone
production pipeline (reference: vc.py — set_target_voice/generate/tts/
clean_audio/save_voice_profile/create_voice_clone/clone_voice).
"""
from __future__ import annotations

import base64
import hashlib
import hmac
import json
import logging
import os
import tempfile
import time
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
from scipy import signal as sp_signal

from .config import ChatterboxConfig, S3_SR, S3GEN_SR, SPEECH_VOCAB_SIZE
from .conditionals import Conditionals
from .models import s3gen as s3gen_mod
from .models import s3tokenizer as s3tok_mod
from .models import t3 as t3_mod
from .models import voice_encoder as ve_mod
from .models.s3gen import VoiceProfile
from .models.t3 import T3Cond
from .models.tokenizer import EnTokenizer
from .text import punc_norm
from .utils import audio_io
from .utils.watermark import get_watermarker
from .serving import storage

logger = logging.getLogger(__name__)

_TOKEN_BUCKETS = (128, 256, 512, 1024)


def _bucket(n: int) -> int:
    for b in _TOKEN_BUCKETS:
        if n <= b:
            return b
    return n


class ChatterboxVC:
    def __init__(self, s3gen_params, t3_params=None, ve_params=None,
                 tokenizer: Optional[EnTokenizer] = None,
                 ref_dict: Optional[Dict[str, Any]] = None,
                 config: ChatterboxConfig = ChatterboxConfig(), dtype=jnp.float32):
        self.sr = S3GEN_SR
        self.cfg = config
        self.dtype = dtype
        self.s3gen_params = s3gen_params
        self.t3_params = t3_params
        self.ve_params = ve_params
        self.tokenizer = tokenizer
        self.ref_dict = ref_dict
        self.ve_embedding: Optional[np.ndarray] = None
        self.watermarker = get_watermarker()
        # attachable raw-text -> speech-token encoder used by
        # inference_from_text (reference: s3gen.py:356-424; README wires
        # `vc_model.s3gen.text_encoder = tts_model.t3`)
        self.text_encoder = None

    # ------------------------------------------------------------------
    # constructors (reference: vc.py:120-234)
    # ------------------------------------------------------------------

    @classmethod
    def from_random(cls, seed: int = 0, config: ChatterboxConfig = ChatterboxConfig(),
                    dtype=jnp.float32):
        k = jax.random.split(jax.random.PRNGKey(seed), 3)
        from .tts import _FallbackTokenizer
        from .utils.device import init_on_cpu, to_default_device
        s3p = to_default_device(init_on_cpu(s3gen_mod.init, k[0], config.s3gen))
        t3p = to_default_device(init_on_cpu(t3_mod.init, k[1], config.t3))
        vep = to_default_device(init_on_cpu(ve_mod.init, k[2], config.voice_encoder))
        return cls(s3p, t3p, vep, _FallbackTokenizer(config.t3), config=config, dtype=dtype)

    @classmethod
    def from_local(cls, ckpt_dir, device=None, config: ChatterboxConfig = ChatterboxConfig(),
                   dtype=jnp.float32):
        from .utils import weights as W
        ckpt_dir = Path(ckpt_dir)
        s3_sd = W.load_safetensors(str(ckpt_dir / "s3gen.safetensors"))
        s3gen_params = jax.tree.map(jnp.asarray, W.convert_s3gen(s3_sd, cfg=config.s3gen))
        t3_params = ve_params = tokenizer = None
        if (ckpt_dir / "t3_cfg.safetensors").exists():
            t3_params = jax.tree.map(jnp.asarray, W.convert_t3(
                W.load_safetensors(str(ckpt_dir / "t3_cfg.safetensors")),
                num_layers=config.t3.llama.num_layers))
        if (ckpt_dir / "ve.safetensors").exists():
            ve_params = jax.tree.map(jnp.asarray, W.convert_voice_encoder(
                W.load_safetensors(str(ckpt_dir / "ve.safetensors"))))
        if (ckpt_dir / "tokenizer.json").exists():
            tokenizer = EnTokenizer(str(ckpt_dir / "tokenizer.json"))
        ref_dict = None
        if (ckpt_dir / "conds.pt").exists():
            ref_dict = Conditionals.load(str(ckpt_dir / "conds.pt")).gen
        return cls(s3gen_params, t3_params, ve_params, tokenizer, ref_dict,
                   config, dtype)

    @classmethod
    def from_pretrained(cls, device=None, **kw):
        try:
            from huggingface_hub import hf_hub_download
        except ImportError as e:
            raise RuntimeError("huggingface_hub unavailable; use from_local()") from e
        from .tts import REPO_ID
        local_path = None
        for f in ["ve.safetensors", "t3_cfg.safetensors", "s3gen.safetensors",
                  "tokenizer.json", "conds.pt"]:
            local_path = hf_hub_download(repo_id=REPO_ID, filename=f)
        return cls.from_local(Path(local_path).parent, device, **kw)

    # ------------------------------------------------------------------
    # target voice (reference: vc.py:308-324)
    # ------------------------------------------------------------------

    def set_target_voice(self, wav_fpath: str):
        wav, sr = audio_io.load_audio(wav_fpath)
        self.ref_dict = s3gen_mod.embed_ref(self.s3gen_params, wav, sr, self.cfg.s3gen)
        if self.ve_params is not None:
            wav16, _ = audio_io.load_audio(wav_fpath, sr=S3_SR)
            self.ve_embedding = ve_mod.embeds_from_wavs(
                self.ve_params, [wav16], S3_SR, self.cfg.voice_encoder
            ).mean(axis=0, keepdims=True)

    # ------------------------------------------------------------------
    # voice conversion (reference: vc.py:327-348)
    # ------------------------------------------------------------------

    def generate(self, audio: str | np.ndarray, target_voice_path: Optional[str] = None,
                 seed: int = 0) -> np.ndarray:
        """Convert `audio` to the target voice. Returns (1, T) float32 @24 kHz."""
        if target_voice_path:
            self.set_target_voice(target_voice_path)
        assert self.ref_dict is not None, "no target voice set"
        if isinstance(audio, str):
            wav16, _ = audio_io.load_audio(audio, sr=S3_SR)
        else:
            wav16 = np.asarray(audio, np.float32).reshape(-1)
        wav16 = s3tok_mod.pad_to_token_multiple(wav16)
        tokens, lens = s3tok_mod.tokenize_wave(
            self.s3gen_params["tokenizer"], jnp.asarray(wav16)[None],
            cfg=self.cfg.s3gen.tokenizer)
        wav = self._tokens_to_wav(np.asarray(tokens)[0], seed)
        wav = self.watermarker.apply_watermark(wav, sample_rate=self.sr)
        return wav[None, :]

    def _tokens_to_wav(self, speech_tokens: np.ndarray, seed: int = 0) -> np.ndarray:
        gen = self.ref_dict
        n = int(speech_tokens.shape[-1])
        bkt = _bucket(n)
        toks = np.zeros((1, bkt), np.int32)
        toks[0, :n] = speech_tokens
        token_len = jnp.asarray([int(np.asarray(gen["prompt_token_len"]).reshape(-1)[0]) + n])
        wav = s3gen_mod.token_to_wav(
            self.s3gen_params, jnp.asarray(toks), token_len,
            jnp.asarray(np.asarray(gen["prompt_token"]), jnp.int32),
            jnp.asarray(np.asarray(gen["prompt_feat"]), jnp.float32),
            jnp.asarray(np.asarray(gen["embedding"]), jnp.float32),
            key=jax.random.PRNGKey(seed), cfg=self.cfg.s3gen, dtype=self.dtype)
        return np.asarray(wav[0])[: 2 * n * 480]

    def inference_from_text(self, text: str, ref_dict: Dict[str, Any], *,
                            finalize: bool = True, seed: int = 0) -> np.ndarray:
        """Raw text + in-memory voice profile -> waveform, via an attached
        `text_encoder` exposing `encode(text) -> speech token ids` (or a bare
        callable). Mirrors S3Token2Wav.inference_from_text
        (reference: models/s3gen/s3gen.py:356-424); raises RuntimeError when
        no encoder is attached so callers can fall back, exactly like the
        reference. Returns (T,) float32 @ 24 kHz.
        """
        if self.text_encoder is None:
            raise RuntimeError(
                "ChatterboxVC.inference_from_text: no `text_encoder` attached "
                "(expected an object with `.encode(text) -> token ids`).")
        if hasattr(self.text_encoder, "encode"):
            speech_tokens = self.text_encoder.encode(text)
        elif callable(self.text_encoder):
            speech_tokens = self.text_encoder(text)
        else:
            raise RuntimeError(
                "ChatterboxVC.inference_from_text: `text_encoder` has neither "
                f"an `.encode()` method nor is callable (got {type(self.text_encoder)})")
        speech_tokens = np.asarray(speech_tokens, np.int32).reshape(-1)
        speech_tokens = speech_tokens[speech_tokens < SPEECH_VOCAB_SIZE]
        prev = self.ref_dict
        try:
            self.ref_dict = ref_dict
            return self._tokens_to_wav(speech_tokens, seed)
        finally:
            self.ref_dict = prev

    # ------------------------------------------------------------------
    # profile-based TTS (reference: vc.py:353-506)
    # ------------------------------------------------------------------

    def tts(self, text: str, voice_profile_path: Optional[str] = None,
            temperature: float = 0.8, cfg_weight: float = 0.5, exaggeration: float = 0.5,
            seed: int = 0) -> np.ndarray:
        assert self.t3_params is not None and self.tokenizer is not None, \
            "tts path needs t3 + tokenizer"
        profile = None
        if voice_profile_path:
            profile = self.set_voice_profile(voice_profile_path)
        assert self.ref_dict is not None, "no voice profile / target voice set"

        text = punc_norm(text)
        tok = self.tokenizer.text_to_tokens(text)[0]
        t3cfg = self.cfg.t3
        text_tokens = np.concatenate([[t3cfg.start_text_token], tok,
                                      [t3cfg.stop_text_token]]).astype(np.int32)[None]
        spk = self.ve_embedding
        if spk is None and profile is not None and profile.ve_embedding is not None:
            spk = np.asarray(profile.ve_embedding)
        assert spk is not None, "profile missing ve_embedding"
        plen = t3cfg.speech_cond_prompt_len
        cond = T3Cond(speaker_emb=jnp.asarray(spk, jnp.float32),
                      cond_prompt_speech_tokens=jnp.asarray(
                          np.asarray(self.ref_dict["prompt_token"])[:, :plen], jnp.int32),
                      emotion_adv=float(exaggeration))
        speech = t3_mod.generate(self.t3_params, cond, text_tokens, max_new_tokens=1000,
                                 temperature=temperature, cfg_weight=cfg_weight,
                                 seed=seed, cfg=t3cfg, dtype=self.dtype)
        speech = s3tok_mod.drop_invalid_tokens(speech)
        speech = speech[speech < 6561]
        wav = self._tokens_to_wav(speech, seed)
        wav = self.watermarker.apply_watermark(wav, sample_rate=self.sr)
        # peak normalise to -1 dBFS (reference: vc.py tts tail)
        peak = np.abs(wav).max()
        if peak > 0:
            wav = wav / peak * 10 ** (-1.0 / 20.0)
        return wav[None, :]

    # ------------------------------------------------------------------
    # audio cleaning (reference: vc.py:511-601)
    # ------------------------------------------------------------------

    def clean_audio(self, in_path: str, out_path: Optional[str] = None) -> str:
        """Spectral-gate denoise + 85 Hz 6th-order high-pass + -3 dB peak norm
        + edge trims. The reference calls `noisereduce` in NON-stationary
        mode (vc.py:551-556: stationary=False, prop_decrease=0.85); the
        default here matches that (time-smoothed per-frequency noise floor —
        robust to drifting background, where a stationary gate collapses:
        tests/test_aux.py pins the bounds). CHATTERBOX_CLEAN_STATIONARY=1
        switches to the stationary gate."""
        wav, sr = audio_io.load_audio(in_path)
        if os.getenv("CHATTERBOX_CLEAN_STATIONARY", "0") == "1":
            wav = _spectral_gate(wav, sr)
        else:
            wav = _spectral_gate_nonstationary(wav, sr)
        sos = sp_signal.butter(6, 85.0, btype="highpass", fs=sr, output="sos")
        wav = sp_signal.sosfilt(sos, wav).astype(np.float32)
        peak = np.abs(wav).max()
        if peak > 0:
            wav = wav / peak * 10 ** (-3.0 / 20.0)
        wav = ve_mod.trim_silence(wav, top_db=30)
        wav = ve_mod.trim_silence(wav, top_db=40)
        out_path = out_path or in_path.rsplit(".", 1)[0] + "_clean.wav"
        audio_io.save_audio(out_path, wav, sr)
        return out_path

    # ------------------------------------------------------------------
    # voice profiles (reference: vc.py:606-752)
    # ------------------------------------------------------------------

    def save_voice_profile(self, audio_file_path: str, save_path: str):
        wav, sr = audio_io.load_audio(audio_file_path)
        rd = s3gen_mod.embed_ref(self.s3gen_params, wav, sr, self.cfg.s3gen)
        ve_embedding = None
        if self.ve_params is not None:
            wav16, _ = audio_io.load_audio(audio_file_path, sr=S3_SR)
            ve_embedding = ve_mod.embeds_from_wavs(
                self.ve_params, [wav16], S3_SR, self.cfg.voice_encoder
            ).mean(axis=0, keepdims=True).astype(np.float32)
        VoiceProfile(embedding=rd["embedding"], prompt_feat=rd["prompt_feat"],
                     prompt_feat_len=rd["prompt_feat_len"], prompt_token=rd["prompt_token"],
                     prompt_token_len=rd["prompt_token_len"],
                     ve_embedding=ve_embedding).save(save_path)

    def load_voice_profile(self, path: str) -> VoiceProfile:
        return VoiceProfile.load(path)

    def set_voice_profile(self, path: str) -> VoiceProfile:
        profile = VoiceProfile.load(path)
        self.ref_dict = dict(prompt_token=profile.prompt_token,
                             prompt_token_len=profile.prompt_token_len,
                             prompt_feat=profile.prompt_feat,
                             prompt_feat_len=profile.prompt_feat_len,
                             embedding=profile.embedding)
        if profile.ve_embedding is not None:
            self.ve_embedding = np.asarray(profile.ve_embedding)
        return profile

    # ------------------------------------------------------------------
    # clone pipeline (reference: vc.py:817-1244)
    # ------------------------------------------------------------------

    def create_voice_clone(self, audio_path: str, voice_id: str, voice_name: str = "",
                           user_id: str = "", language: str = "en",
                           bucket: Optional[str] = None,
                           callback_url: Optional[str] = None,
                           sample_text: Optional[str] = None,
                           metadata: Optional[Dict[str, Any]] = None,
                           is_kids_voice: bool = False) -> Dict[str, Any]:
        """clean -> save profile -> set -> TTS sample -> MP3 -> upload ->
        Firestore upsert -> HMAC callback (reference: vc.py:817-1244).

        `metadata` follows the reference contract: may carry language,
        is_kids_voice, callback_url, storage_metadata (user_id/voice_name),
        model_type and explicit profile_filename / sample_filename /
        recorded_path; when filenames are present the reference's
        `audio/voices/{language}[/kids]/...` storage layout is used.
        BOTH outcomes fire the signed callback: success payloads and error
        payloads (status, error) — the round-1 build only signed success.
        """
        t0 = time.time()
        metadata = metadata or {}
        language = metadata.get("language", language)
        is_kids_voice = bool(metadata.get("is_kids_voice", is_kids_voice))
        callback_url = metadata.get("callback_url", callback_url)
        storage_meta = metadata.get("storage_metadata") or {}
        user_id = storage_meta.get("user_id", user_id)
        voice_name = storage_meta.get("voice_name", voice_name)
        model_type = metadata.get("model_type", "chatterbox")
        base_path = (f"audio/voices/{language}/kids" if is_kids_voice
                     else f"audio/voices/{language}")
        profile_fn = metadata.get("profile_filename")
        sample_fn = metadata.get("sample_filename")
        recorded_path = (metadata.get("recorded_path")
                         or metadata.get("recorded_filename") or "")
        profile_key = (f"{base_path}/profiles/{profile_fn}" if profile_fn
                       else f"private/users/{user_id}/voices/profiles/{voice_id}.npy")
        sample_key = (f"{base_path}/samples/{sample_fn}" if sample_fn
                      else f"private/users/{user_id}/voices/samples/{voice_id}.mp3")

        def cb_payload(status: str, **extra) -> Dict[str, Any]:
            p = {"status": status, "user_id": user_id, "voice_id": voice_id,
                 "voice_name": voice_name, "language": language,
                 "is_kids_voice": is_kids_voice, "model_type": model_type,
                 "profile_path": profile_key, "sample_path": sample_key,
                 "recorded_path": recorded_path}
            p.update(extra)
            return p

        clean_path = profile_path = None
        result: Dict[str, Any] = {"voice_id": voice_id, "voice_name": voice_name}
        try:
            clean_path = self.clean_audio(audio_path)
            with tempfile.NamedTemporaryFile(suffix=".npy", delete=False) as f:
                profile_path = f.name
            self.save_voice_profile(clean_path, profile_path)
            self.set_voice_profile(profile_path)

            # profile upload
            with open(profile_path, "rb") as fh:
                profile_bytes = fh.read()
            result["profile_url"] = storage.upload_to_r2(
                profile_bytes, profile_key, bucket)
            result["profile_key"] = profile_key

            # sample synthesis (fallback: the cleaned reference audio itself,
            # reference: vc.py:926-939)
            sample_text = sample_text or "Hello! This is a preview of your cloned voice."
            try:
                sample_wav = self.tts(sample_text).reshape(-1)
            except Exception as e:  # noqa: BLE001
                logger.warning("sample TTS failed (%s); using reference audio", e)
                sample_wav, _ = audio_io.load_audio(clean_path, sr=self.sr)
            mp3 = audio_io.wav_to_mp3_bytes(sample_wav, self.sr)
            result["sample_url"] = storage.upload_to_r2(mp3, sample_key, bucket,
                                                        content_type="audio/mpeg")
            result["sample_key"] = sample_key

            # Firestore upsert (reference: vc.py voice_profiles/{voice_id})
            try:
                client = storage.init_firestore_client()
                client.collection("voice_profiles").document(voice_id).set({
                    "voice_id": voice_id, "name": voice_name, "user_id": user_id,
                    "language": language, "profile_key": profile_key,
                    "sample_key": sample_key, "created_at": time.time(),
                }, merge=True)
                result["firestore_updated"] = True
            except Exception as e:  # noqa: BLE001
                logger.warning("firestore upsert failed: %s", e)
                result["firestore_updated"] = False

            result["status"] = "success"
            result["elapsed_s"] = time.time() - t0
            if callback_url:
                _signed_callback(callback_url, cb_payload("success"))
            return result
        except Exception as e:  # noqa: BLE001
            # error-path callback (reference: vc.py:1177-1237)
            logger.error("create_voice_clone failed: %s", e)
            if callback_url:
                try:
                    _signed_callback(callback_url, cb_payload("error", error=str(e)))
                except Exception as cb_e:  # noqa: BLE001
                    logger.warning("error callback failed: %s", cb_e)
            return {"status": "error", "voice_id": voice_id, "error": str(e),
                    "generation_time": time.time() - t0}
        finally:
            for p in (profile_path, clean_path):
                if p is None:
                    continue
                try:
                    os.unlink(p)
                except OSError:
                    pass


def _signed_callback(url: str, payload: Dict[str, Any]):
    """HMAC-SHA256 signed POST using the reference wire protocol
    (reference: vc.py:1147-1166): signature over "POST\\n{path}\\n{ts}\\n"+body
    in X-Minstraly-Signature with X-Minstraly-Timestamp; unsigned when no
    shared secret is configured."""
    import urllib.request
    from urllib.parse import urlparse
    secret = os.getenv("MINSTRALY_API_SHARED_SECRET", "")
    body = json.dumps(payload, default=str).encode()
    headers = {"Content-Type": "application/json"}
    if secret:
        path = urlparse(url).path or "/api/voice-clone/callback"
        ts = str(int(time.time() * 1000))
        prefix = f"POST\n{path}\n{ts}\n".encode()
        sig = hmac.new(secret.encode(), prefix + body, hashlib.sha256).hexdigest()
        headers.update({"X-Minstraly-Timestamp": ts, "X-Minstraly-Signature": sig})
    req = urllib.request.Request(url, data=body, method="POST", headers=headers)
    try:
        urllib.request.urlopen(req, timeout=15)
    except Exception as e:  # noqa: BLE001
        logger.warning("callback to %s failed: %s", url, e)


def clone_voice(vc: ChatterboxVC, *, voice_id: str, voice_name: str = "",
                user_id: str = "", language: str = "en",
                audio_b64: Optional[str] = None, audio_r2_key: Optional[str] = None,
                bucket: Optional[str] = None,
                metadata: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Worker entry: bytes -> temp file -> create_voice_clone
    (reference: vc.py:1284-1364; the reference's worker passes an unsupported
    `profile_id` kwarg — a live bug we do not replicate)."""
    if audio_b64:
        data = base64.b64decode(audio_b64)
    elif audio_r2_key:
        data = storage.download_from_r2(audio_r2_key, bucket)
    else:
        raise ValueError("need audio_b64 or audio_r2_key")
    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        f.write(data)
        path = f.name
    try:
        return vc.create_voice_clone(path, voice_id, voice_name, user_id, language,
                                     bucket, metadata=metadata)
    finally:
        try:
            os.unlink(path)
        except OSError:
            pass


def _spectral_gate_nonstationary(wav: np.ndarray, sr: int, n_fft: int = 1024,
                                 prop_decrease: float = 0.85,
                                 time_constant_s: float = 2.0,
                                 thresh_mult: float = 2.0,
                                 slope: float = 10.0) -> np.ndarray:
    """Non-stationary spectral gating à la `noisereduce`'s
    SpectralGateNonStationary — the mode the reference actually calls
    (vc.py:551-556: stationary=False, prop_decrease=0.85): the noise floor
    is a per-frequency TIME-SMOOTHED magnitude (time_constant_s window), so
    slowly-varying background (babble, hum drift) is tracked instead of
    assumed constant; bins are soft-masked by a sigmoid on their relative
    excess over the floor."""
    hop = n_fft // 4
    if len(wav) < n_fft:
        return wav
    from scipy.ndimage import uniform_filter1d
    f, t, z = sp_signal.stft(wav, fs=sr, nperseg=n_fft, noverlap=n_fft - hop)
    mag = np.abs(z)
    frames = max(1, int(time_constant_s * sr / hop))
    floor = uniform_filter1d(mag, frames, axis=1, mode="nearest")
    excess = (mag - floor) / (floor + 1e-12)
    mask = 1.0 / (1.0 + np.exp(-(excess - thresh_mult) * slope))
    # smooth the mask over time so note onsets don't flutter
    mask = uniform_filter1d(mask, 5, axis=1, mode="nearest")
    # noisereduce's blend: passed bins ~1, gated bins (1 - prop_decrease)
    gain = mask * prop_decrease + (1.0 - prop_decrease)
    _, clean = sp_signal.istft(z * gain, fs=sr, nperseg=n_fft,
                               noverlap=n_fft - hop)
    return clean[: len(wav)].astype(np.float32)


def _spectral_gate(wav: np.ndarray, sr: int, n_fft: int = 1024,
                   prop_decrease: float = 1.0) -> np.ndarray:
    """Stationary spectral gating à la `noisereduce`: estimate the noise floor
    per frequency from the quietest frames, mask bins below floor + 1.5 std."""
    hop = n_fft // 4
    if len(wav) < n_fft:
        return wav
    f, t, z = sp_signal.stft(wav, fs=sr, nperseg=n_fft, noverlap=n_fft - hop)
    mag = np.abs(z)
    db = 20.0 * np.log10(mag + 1e-10)
    frame_energy = db.mean(axis=0)
    quiet = db[:, frame_energy <= np.quantile(frame_energy, 0.1)]
    if quiet.size == 0:
        return wav
    noise_mean = quiet.mean(axis=1, keepdims=True)
    noise_std = quiet.std(axis=1, keepdims=True)
    thresh = noise_mean + 1.5 * noise_std
    mask = (db > thresh).astype(np.float32)
    # smooth the mask over time
    kernel = np.ones((1, 5), np.float32) / 5.0
    mask = sp_signal.convolve2d(mask, kernel, mode="same")
    gain = mask + (1.0 - mask) * (1.0 - prop_decrease)
    _, clean = sp_signal.istft(z * gain, fs=sr, nperseg=n_fft, noverlap=n_fft - hop)
    return clean[: len(wav)].astype(np.float32)
