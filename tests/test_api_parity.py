"""API-surface parity details added in round 2 (reference: s3gen.py:356-424
inference_from_text; vc.py:1121-1244 signed success/error callbacks;
tts.py:1711-1726 story result payload fields)."""
import json
import numpy as np
import pytest

from test_pipeline import TINY, ref_voice_wav  # noqa: F401 (fixture reuse)


@pytest.fixture(scope="module")
def vc():
    from chatterbox_embed_tpu.vc import ChatterboxVC
    return ChatterboxVC.from_random(seed=0, config=TINY)


def _capture_posts(monkeypatch):
    posts = []

    def fake_urlopen(req, timeout=None):
        posts.append({"url": req.full_url, "headers": dict(req.headers),
                      "body": json.loads(req.data.decode())})
        class R:
            def read(self):
                return b""
            def __enter__(self):
                return self
            def __exit__(self, *a):
                return False
        return R()

    import urllib.request
    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    return posts


def test_signed_callback_protocol(monkeypatch):
    """Signature = HMAC-SHA256 over 'POST\\n{path}\\n{ts}\\n' + body in the
    X-Minstraly-* headers (reference: vc.py:1147-1166)."""
    import hashlib
    import hmac as hmac_mod
    from chatterbox_embed_tpu.vc import _signed_callback
    posts = _capture_posts(monkeypatch)
    monkeypatch.setenv("MINSTRALY_API_SHARED_SECRET", "s3cret")
    _signed_callback("https://api.example.com/api/voice-clone/callback",
                     {"status": "success", "voice_id": "v1"})
    assert len(posts) == 1
    p = posts[0]
    ts = p["headers"]["X-minstraly-timestamp"]
    body = json.dumps(p["body"], default=str).encode()
    expect = hmac_mod.new(b"s3cret",
                          f"POST\n/api/voice-clone/callback\n{ts}\n".encode() + body,
                          hashlib.sha256).hexdigest()
    assert p["headers"]["X-minstraly-signature"] == expect


def test_create_voice_clone_error_callback(monkeypatch, tmp_path, vc):
    """Failures must fire a status=error callback with the reference payload
    keys (reference: vc.py:1177-1237)."""
    posts = _capture_posts(monkeypatch)
    monkeypatch.setenv("MINSTRALY_API_SHARED_SECRET", "s3cret")
    monkeypatch.setenv("CHATTERBOX_LOCAL_STORAGE", str(tmp_path / "store"))
    result = vc.create_voice_clone(
        str(tmp_path / "does_not_exist.wav"), "v9", "Broken",
        metadata={"callback_url": "https://api.example.com/cb",
                  "language": "da", "is_kids_voice": True,
                  "profile_filename": "v9.npy", "sample_filename": "v9.mp3",
                  "storage_metadata": {"user_id": "u7", "voice_name": "Broken"}})
    assert result["status"] == "error"
    assert "generation_time" in result and "error" in result
    assert len(posts) == 1
    body = posts[0]["body"]
    assert body["status"] == "error"
    assert body["voice_id"] == "v9" and body["user_id"] == "u7"
    assert body["language"] == "da" and body["is_kids_voice"] is True
    assert body["profile_path"] == "audio/voices/da/kids/profiles/v9.npy"
    assert body["sample_path"] == "audio/voices/da/kids/samples/v9.mp3"
    assert "error" in body


@pytest.mark.slow
def test_inference_from_text(vc, ref_voice_wav):
    vc.set_target_voice(ref_voice_wav)
    ref_dict = vc.ref_dict
    with pytest.raises(RuntimeError, match="text_encoder"):
        vc.inference_from_text("hello", ref_dict)
    # attach a callable encoder (reference accepts .encode() or a callable)
    vc.text_encoder = lambda text: np.arange(12, dtype=np.int32) % 50
    wav = vc.inference_from_text("hello", ref_dict)
    assert wav.ndim == 1 and wav.size > 0 and np.isfinite(wav).all()
    vc.text_encoder = None


def test_story_result_payload_keys(monkeypatch, tmp_path):
    """generate_tts_story result must carry every reference payload field."""
    from chatterbox_embed_tpu.serving import jobs
    monkeypatch.setenv("CHATTERBOX_LOCAL_STORAGE", str(tmp_path / "store"))

    class FakeTTS:
        sr = 24_000
        class advanced_stitcher:  # noqa: N801 - attribute stand-in
            global_pause_factor = 1.2
        def generate_long_text(self, text, **kw):
            return np.zeros((1, 24_000), np.float32), {"duration_s": 1.0}

    import base64
    profile_b64 = base64.b64encode(b"fake").decode()
    result = jobs.generate_tts_story(
        FakeTTS(), story_id="s1", user_id="u1", text="hi there",
        voice_profile_b64=profile_b64, voice_id="v1",
        metadata={"story_type": "app", "voice_name": "Voice"})
    assert result["status"] == "success"
    for key in ("audio_data", "storage_url", "storage_path", "r2_path", "r2_url",
                "audio_url", "firebase_url", "firebase_path", "version_id",
                "story_type", "generation_time", "duration"):
        assert key in result, key
    assert result["story_type"] == "app"
    assert result["r2_path"].startswith("private/users/u1/stories/audio/en/s1/")
    # error path mirrors the reference error dict
    bad = jobs.generate_tts_story(FakeTTS(), story_id="s2", user_id="u1",
                                  text="x")  # no profile source
    assert bad["status"] == "error" and "generation_time" in bad
