"""End-to-end serving jobs (reference: tts.py:1520-1799 generate_tts_story —
profile from base64 or R2, long-text synthesis, MP3 encode, R2 upload at the
production path layout, optional direct Firestore status update)."""
from __future__ import annotations

import base64
import logging
import os
import tempfile
import time
from typing import Any, Dict, Optional

import numpy as np

from ..utils import audio_io
from . import storage

logger = logging.getLogger(__name__)


def generate_tts_story(tts, *, story_id: str, user_id: str, text: str,
                       voice_profile_b64: Optional[str] = None,
                       voice_profile_r2_key: Optional[str] = None,
                       language: str = "en", version_id: str = "v1",
                       exaggeration: float = 0.5, cfg_weight: float = 0.6,
                       temperature: float = 0.7, bucket: Optional[str] = None,
                       update_firestore: Optional[bool] = None) -> Dict[str, Any]:
    """Full TTS job. Returns a result dict mirroring the reference's payload."""
    t0 = time.time()
    if update_firestore is None:
        update_firestore = os.getenv(
            "CHATTERBOX_ENABLE_DIRECT_FIRESTORE_UPDATE", "false").lower() == "true"

    # --- voice profile: base64 payload or R2 object (reference: tts.py:1545-1600)
    with tempfile.NamedTemporaryFile(suffix=".npy", delete=False) as f:
        profile_path = f.name
    try:
        if voice_profile_b64:
            with open(profile_path, "wb") as fh:
                fh.write(base64.b64decode(voice_profile_b64))
        elif voice_profile_r2_key:
            with open(profile_path, "wb") as fh:
                fh.write(storage.download_from_r2(voice_profile_r2_key, bucket))
        else:
            raise ValueError("need voice_profile_b64 or voice_profile_r2_key")

        wav, metadata = tts.generate_long_text(
            text, voice_profile_path=profile_path, exaggeration=exaggeration,
            cfg_weight=cfg_weight, temperature=temperature)
    finally:
        try:
            os.unlink(profile_path)
        except OSError:
            pass

    mp3 = audio_io.wav_to_mp3_bytes(wav.reshape(-1), tts.sr, bitrate="96k")
    audio_key = (f"private/users/{user_id}/stories/audio/{language}/"
                 f"{story_id}/{version_id}.mp3")
    url = storage.upload_to_r2(mp3, audio_key, bucket, content_type="audio/mpeg",
                               metadata={"story_id": story_id, "user_id": user_id})

    result = {
        "status": "success",
        "story_id": story_id,
        "user_id": user_id,
        "audio_url": url,
        "audio_key": audio_key,
        "duration_s": metadata["duration_s"],
        "generation_time_s": time.time() - t0,
        "metadata": metadata,
    }
    if update_firestore:
        try:
            client = storage.init_firestore_client()
            client.collection("stories").document(story_id).set(
                {"audio": {version_id: {"url": url, "duration": metadata["duration_s"],
                                        "generatedAt": time.time()}}}, merge=True)
            result["firestore_updated"] = True
        except Exception as e:  # noqa: BLE001 — job must not die on status write
            logger.warning("firestore update failed: %s", e)
            result["firestore_updated"] = False
    return result
