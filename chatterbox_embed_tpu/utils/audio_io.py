"""Host-side audio I/O: wav read/write natively, other containers via the
ffmpeg CLI when present (the reference leans on librosa/pydub/ffmpeg —
tts.py:11, audio/conversion.py)."""
from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..stitching.stitcher import read_wav, write_wav
from ..ops import resample as resample_ops


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def load_audio(path: str, sr: Optional[int] = None) -> Tuple[np.ndarray, int]:
    """Load any audio file -> (mono float32, sample_rate). Resamples to `sr`
    when given (librosa.load equivalent)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".wav":
        wav, file_sr = read_wav(path)
    elif ffmpeg_available():
        with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
            tmp = f.name
        try:
            subprocess.run(["ffmpeg", "-y", "-i", path, "-ac", "1", tmp],
                           check=True, capture_output=True)
            wav, file_sr = read_wav(tmp)
        finally:
            os.unlink(tmp)
    else:
        raise RuntimeError(f"cannot decode {ext} without ffmpeg; provide wav input")
    if sr is not None and sr != file_sr:
        wav = np.asarray(resample_ops.resample(jnp.asarray(wav), file_sr, sr))
        file_sr = sr
    return wav.astype(np.float32), file_sr


def save_audio(path: str, wav: np.ndarray, sr: int):
    write_wav(path, np.asarray(wav, np.float32).reshape(-1), sr)


def wav_to_mp3_bytes(wav: np.ndarray, sr: int, bitrate: str = "96k",
                     headroom_db: float = -0.3) -> bytes:
    """tensor -> MP3 bytes with clipping headroom (reference:
    audio/conversion.py:16-131). Requires ffmpeg; falls back to WAV bytes."""
    wav = np.clip(np.asarray(wav, np.float32).reshape(-1), -1.0, 1.0)
    peak = np.abs(wav).max()
    target = 10.0 ** (headroom_db / 20.0)
    if peak > target:
        wav = wav * (target / peak)
    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        tmp_wav = f.name
    write_wav(tmp_wav, wav, sr)
    try:
        if not ffmpeg_available():
            with open(tmp_wav, "rb") as f:
                return f.read()
        tmp_mp3 = tmp_wav[:-4] + ".mp3"
        subprocess.run(["ffmpeg", "-y", "-i", tmp_wav, "-b:a", bitrate, tmp_mp3],
                       check=True, capture_output=True)
        try:
            with open(tmp_mp3, "rb") as f:
                return f.read()
        finally:
            os.unlink(tmp_mp3)
    finally:
        os.unlink(tmp_wav)
