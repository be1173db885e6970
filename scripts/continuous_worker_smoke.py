"""q4ab: full-size TPU smoke of the ARRIVAL-DRIVEN continuous worker.

The q4aa probe (PERF_NOTES.md) measured the slot-refill engine's latency
win at the ENGINE level; the CPU suite covers `RedisWorker.run_continuous`
at toy size. This drives the whole worker path ONCE at full size on the
real chip — jobs in (in-memory stream backend, one arriving MID-DECODE) →
profile-source conds cache → ContinuousStoryServer (chunk → engine decode
→ gates/retries → stitch → watermark) → storage upload + status hash +
ack — the class of bug it exists to catch is device-placement/trace
issues that only appear on the non-CPU backend. Random weights: audio is
noise, but shapes, finiteness, per-job status/storage contracts and the
mid-decode admission are all real. Passing this smoke is the gate for
flipping WORKER_CONTINUOUS on by default (PERF_NOTES.md q4aa promotion).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python scripts/continuous_worker_smoke.py
"""
from __future__ import annotations

import base64
import json
import os
import pathlib
import sys
import time

import numpy as np

os.environ.setdefault("CHATTERBOX_LOCAL_STORAGE", "/tmp/q4ab_store")
os.environ.setdefault("WORKER_SLOTS", "8")
os.environ.setdefault("WORKER_TEXT_BUCKET", "384")
os.environ.setdefault("WORKER_BLOCK", "64")
os.environ.setdefault("WORKER_MAX_NEW_TOKENS", "220")


class LateArrivalStreams:
    """InMemoryStreams wrapper that holds back designated messages until the
    worker has polled `release_after` times — a deterministic stand-in for a
    job landing while the engine is mid-decode (run_continuous polls once
    per pump iteration, so by then earlier jobs' chunks are in flight)."""

    def __init__(self, inner, release_after: int = 3):
        self._inner = inner
        self._held = []
        self._release_after = release_after
        self._polls = 0

    def hold(self, stream, fields):
        self._held.append((stream, fields))

    def xreadgroup(self, *a, **k):
        self._polls += 1
        if self._held and self._polls > self._release_after:
            for stream, fields in self._held:
                self._inner.xadd(stream, fields)
            self._held.clear()
        return self._inner.xreadgroup(*a, **k)

    def __getattr__(self, name):
        return getattr(self._inner, name)


def main():
    tiny = "--tiny" in sys.argv  # CPU shakeout of the harness itself
    if tiny:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.update(WORKER_SLOTS="2", WORKER_TEXT_BUCKET="24",
                          WORKER_BLOCK="8", WORKER_MAX_NEW_TOKENS="16")
    import jax
    if tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from chatterbox_embed_tpu.config import ChatterboxConfig
    from chatterbox_embed_tpu.models import s3gen as s3gen_mod
    from chatterbox_embed_tpu.models import t3 as t3_mod
    from chatterbox_embed_tpu.serving.worker import (RedisWorker,
                                                     InMemoryStreams,
                                                     STREAM_TTS, DLQ_STREAM)
    from chatterbox_embed_tpu.tts import ChatterboxTTS, _FallbackTokenizer
    from chatterbox_embed_tpu.utils.device import (enable_compilation_cache,
                                                   init_on_cpu,
                                                   to_default_device)
    from chatterbox_embed_tpu.utils.quantize import quantize_t3

    t0 = time.time()
    if tiny:
        import chatterbox_embed_tpu.models.t3 as t3mod
        import chatterbox_embed_tpu.tts as ttsmod
        from tests.test_pipeline import TINY
        t3mod._TEXT_BUCKETS = (24, 48)
        ttsmod._TOKEN_BUCKETS = (32, 64, 128)
        cfg = TINY
        tts = ChatterboxTTS.from_random(seed=0, config=cfg)
    else:
        enable_compilation_cache()
        cfg = ChatterboxConfig()
        dtype = jnp.bfloat16
        k = jax.random.split(jax.random.PRNGKey(0), 2)
        t3_params = quantize_t3(init_on_cpu(t3_mod.init, k[0], cfg.t3))
        s3_params = init_on_cpu(s3gen_mod.init, k[1], cfg.s3gen)
        cast = lambda t: jax.tree.map(  # noqa: E731
            lambda x: x.astype(jnp.bfloat16) if x.dtype == np.float32 else x, t)
        t3_params = to_default_device(cast(t3_params))
        s3_params = to_default_device(cast(s3_params))
        jax.block_until_ready((t3_params, s3_params))
        tts = ChatterboxTTS(t3_params, s3_params, None,
                            _FallbackTokenizer(cfg.t3), config=cfg, dtype=dtype)
    print(f"[q4ab] params {time.time() - t0:.1f}s", file=sys.stderr)

    def profile_b64(seed: int) -> str:
        """Full-size VoiceProfile .npy from random arrays (no VE needed —
        the worker path consumes the stored ve_embedding directly)."""
        r = np.random.default_rng(seed)
        n_prompt = 8 if tiny else 150
        prof = s3gen_mod.VoiceProfile(
            embedding=r.standard_normal(
                (1, cfg.s3gen.flow.spk_embed_dim)).astype(np.float32),
            prompt_feat=r.standard_normal(
                (1, 2 * n_prompt, cfg.s3gen.mel_num)).astype(np.float32),
            prompt_feat_len=None,
            prompt_token=r.integers(0, 6561, (1, n_prompt)).astype(np.int32),
            prompt_token_len=np.asarray([n_prompt]),
            ve_embedding=r.standard_normal(
                (1, cfg.t3.speaker_embed_size)).astype(np.float32))
        path = f"/tmp/q4ab_voice_{seed}.npy"
        prof.save(path)
        with open(path, "rb") as f:
            return base64.b64encode(f.read()).decode()

    voices = {1: profile_b64(1), 2: profile_b64(2)}
    if tiny:
        jobs = [("up0", "The knight rode far.", 1),
                ("up1", "The dragon was kind.", 2),
                ("up2", "They became friends.", 1)]
        late = ("late0", "The end came soon.", 2)
    else:
        sent = ("The quick brown fox jumps over the lazy dog while the river "
                "keeps rolling toward the quiet valley below the hills. ")
        jobs = [  # (job_id, text, voice seed) — late0 arrives MID-DECODE
            ("up0", sent * 6, 1),   # 2 chunks
            ("up1", sent * 3, 2),   # 1 chunk
            ("up2", sent * 3, 1),   # 1 chunk, shares up0's voice (conds cache)
        ]
        late = ("late0", sent * 3, 2)

    inner = InMemoryStreams()
    client = LateArrivalStreams(inner, release_after=3)

    def payload(jid, text, vseed):
        return {"payload": json.dumps({
            "job_id": jid, "type": "tts", "story_id": f"s_{jid}",
            "user_id": "smoke", "text": text,
            "voice_profile_b64": voices[vseed],
            "exaggeration": 0.4 + 0.1 * vseed})}

    for jid, text, vseed in jobs:
        inner.xadd(STREAM_TTS, payload(jid, text, vseed))
    client.hold(STREAM_TTS, payload(*late))

    worker = RedisWorker(mode="tts", client=client, tts_factory=lambda: tts)
    t1 = time.time()
    handled = worker.run_continuous(stop_when_drained=True)
    wall = time.time() - t1

    report = {"handled": handled, "wall_s": round(wall, 1), "ok": True,
              "late_arrival_polls": client._polls}
    all_jobs = jobs + [late]
    total_audio = 0.0
    for jid, _text, _v in all_jobs:
        status = inner.hgetall(f"runpod:job:{jid}")
        if status.get("status") != "done":
            report["ok"] = False
            report[f"{jid}_error"] = status.get("error", "<no status>")
            continue
        result = json.loads(status["result"])
        stored = pathlib.Path(result["storage_url"])
        cs = result["metadata"]["chunk_stats"]
        total_audio += result["duration"]
        report[jid] = {"duration_s": round(result["duration"], 2),
                       "chunks": len(cs["chunks"]),
                       "continuous": cs.get("continuous", False),
                       "stored_bytes": stored.stat().st_size
                       if stored.exists() else 0}
        if not cs.get("continuous") or not stored.exists() \
                or stored.stat().st_size < 500:
            report["ok"] = False
    key = (STREAM_TTS, worker.group)
    report["acked"] = len(inner.acked[key])
    report["dlq"] = len(inner.streams[DLQ_STREAM])
    report["audio_s_total"] = round(total_audio, 1)
    if report["acked"] != len(all_jobs) or report["dlq"] != 0 \
            or handled != len(all_jobs):
        report["ok"] = False
    print(json.dumps(report))
    if not report["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
