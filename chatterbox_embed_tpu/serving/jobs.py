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
                       update_firestore: Optional[bool] = None,
                       voice_id: str = "", voice_name: str = "",
                       story_type: str = "user", is_kids_voice: bool = False,
                       pause_scale: float = 1.15,
                       metadata: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Full TTS job. The result dict carries the reference's payload fields
    (status, audio_data, storage_url/storage_path, r2_path/r2_url, audio_url,
    firebase_url/firebase_path aliases, version_id, story_type,
    generation_time, duration — reference tts.py:1711-1726) plus this
    rebuild's richer metadata; the error path mirrors tts.py:1790-1799."""
    t0 = time.time()
    metadata = metadata or {}
    voice_name = voice_name or metadata.get("voice_name") or voice_id
    story_type = metadata.get("story_type", story_type)
    if story_type not in ("user", "app"):
        logger.warning("invalid story_type %r, defaulting to 'user'", story_type)
        story_type = "user"
    if update_firestore is None:
        update_firestore = os.getenv(
            "CHATTERBOX_ENABLE_DIRECT_FIRESTORE_UPDATE", "false").lower() == "true"

    try:
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

            prev_pause = tts.advanced_stitcher.global_pause_factor
            tts.advanced_stitcher.global_pause_factor = pause_scale
            try:
                wav, gen_metadata = tts.generate_long_text(
                    text, voice_profile_path=profile_path, exaggeration=exaggeration,
                    cfg_weight=cfg_weight, temperature=temperature)
            finally:
                tts.advanced_stitcher.global_pause_factor = prev_pause
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

        duration = gen_metadata.get("duration_s", 0)
        result = {
            "status": "success",
            "audio_data": base64.b64encode(mp3).decode("ascii"),
            "storage_url": url,
            "storage_path": audio_key,
            "r2_path": audio_key,
            "r2_url": url,
            "audio_url": url,
            "firebase_url": url,      # compatibility aliases (reference keeps both)
            "firebase_path": audio_key,
            "version_id": version_id,
            "story_type": story_type,
            "generation_time": time.time() - t0,
            "duration": duration,
            # rebuild extras (supersets, not replacements)
            "story_id": story_id,
            "user_id": user_id,
            "audio_key": audio_key,
            "duration_s": duration,
            "generation_time_s": time.time() - t0,
            "metadata": gen_metadata,
        }
        if update_firestore:
            try:
                client = storage.init_firestore_client()
                doc = client.collection("stories").document(story_id)
                new_version = {
                    "id": version_id, "voiceId": voice_id, "voiceName": voice_name,
                    "audioUrl": url, "url": url, "service": "chatterbox",
                    "createdAt": time.time(), "updatedAt": time.time(),
                    "metadata": {"format": "mp3", "size": len(mp3),
                                 "duration": duration, "voiceName": voice_name,
                                 "r2Path": audio_key},
                }
                doc.set({"audioStatus": "ready", "audioUrl": url,
                         "updatedAt": time.time()}, merge=True)
                try:
                    snap = doc.get()
                    existing = []
                    if snap.exists and isinstance(snap.to_dict().get("audioVersions"),
                                                  list):
                        existing = snap.to_dict()["audioVersions"]
                    doc.set({"audioVersions": existing + [new_version]}, merge=True)
                except Exception:  # noqa: BLE001
                    doc.set({"audioVersions": [new_version]}, merge=True)
                result["firestore_updated"] = True
                result["firestore_story_id"] = story_id
            except Exception as e:  # noqa: BLE001 — job must not die on status write
                logger.warning("firestore update failed: %s", e)
                result["firestore_updated"] = False
        return result
    except Exception as e:  # noqa: BLE001 (reference: tts.py:1790-1799)
        logger.error("generate_tts_story failed: %s", e)
        return {"status": "error", "error": str(e),
                "generation_time": time.time() - t0}
