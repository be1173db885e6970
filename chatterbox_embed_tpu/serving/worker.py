"""Redis Streams job worker (reference: worker_redis.py:17-175 — consumer
groups, 5 s blocking reads, per-job status hash, dead-letter stream).

redis-py is optional: when missing, an in-process queue backend with the same
stream semantics lets the worker loop run in tests and hermetic environments.
The distribution model is the reference's: one worker process per accelerator,
data parallelism over requests via consumer groups (SURVEY.md §2.6).
"""
from __future__ import annotations

import json
import logging
import os
import time
import uuid
from collections import defaultdict
from typing import Any, Callable, Dict, List, Optional, Tuple

logger = logging.getLogger(__name__)

STREAM_TTS = "runpod:jobs:tts"
STREAM_VC = "runpod:jobs:vc"
DLQ_STREAM = "runpod:dlq"


class InMemoryStreams:
    """Minimal Redis-Streams-compatible backend (xadd/xreadgroup/xack/hset)."""

    def __init__(self):
        self.streams: Dict[str, List[Tuple[str, Dict[str, str]]]] = defaultdict(list)
        self.delivered: Dict[Tuple[str, str], set] = defaultdict(set)
        self.acked: Dict[Tuple[str, str], set] = defaultdict(set)
        self.hashes: Dict[str, Dict[str, str]] = defaultdict(dict)

    def xadd(self, stream: str, fields: Dict[str, str]) -> str:
        mid = f"{int(time.time() * 1000)}-{len(self.streams[stream])}"
        self.streams[stream].append((mid, dict(fields)))
        return mid

    def xgroup_create(self, stream: str, group: str, id: str = "0", mkstream=False):
        return True

    def xreadgroup(self, group: str, consumer: str, streams: Dict[str, str],
                   count: int = 1, block: int = 0):
        out = []
        for stream in streams:
            key = (stream, group)
            pending = [(m, f) for m, f in self.streams[stream]
                       if m not in self.delivered[key]]
            take = pending[:count]
            for m, _ in take:
                self.delivered[key].add(m)
            if take:
                out.append((stream, take))
        return out

    def xack(self, stream: str, group: str, mid: str):
        self.acked[(stream, group)].add(mid)

    def hset(self, name: str, mapping: Dict[str, str]):
        self.hashes[name].update(mapping)

    def hgetall(self, name: str) -> Dict[str, str]:
        return dict(self.hashes[name])


def _connect_redis():
    try:
        import redis  # type: ignore
        return redis.Redis(
            host=os.getenv("REDIS_HOST", "localhost"),
            port=int(os.getenv("REDIS_PORT", "6379")),
            password=os.getenv("REDIS_PASSWORD") or None,
            db=int(os.getenv("REDIS_DB", "0")),
            decode_responses=True,
        )
    except ImportError:
        logger.warning("redis-py unavailable; using in-memory stream backend")
        return InMemoryStreams()


class RedisWorker:
    """Consume TTS / voice-clone jobs from a stream and run them."""

    def __init__(self, mode: str = "tts", client=None,
                 tts_factory: Optional[Callable] = None,
                 vc_factory: Optional[Callable] = None):
        assert mode in ("tts", "vc")
        self.mode = mode
        self.stream = STREAM_TTS if mode == "tts" else STREAM_VC
        self.group = os.getenv("REDIS_CONSUMER_GROUP", "workers")
        self.consumer = os.getenv("REDIS_CONSUMER_NAME", f"worker-{uuid.uuid4().hex[:8]}")
        self.client = client or _connect_redis()
        self._tts_factory = tts_factory
        self._vc_factory = vc_factory
        self._tts = None
        self._vc = None
        try:
            self.client.xgroup_create(self.stream, self.group, id="0", mkstream=True)
        except Exception:
            pass  # group exists

    # -- job payloads: flattened payload:* fields or one JSON blob
    @staticmethod
    def parse_payload(fields: Dict[str, str]) -> Dict[str, Any]:
        if "payload" in fields:
            return json.loads(fields["payload"])
        payload = {}
        for k, v in fields.items():
            if k.startswith("payload:"):
                payload[k.split(":", 1)[1]] = v
        return payload

    def set_status(self, job_id: str, status: str, **extra):
        self.client.hset(f"runpod:job:{job_id}",
                         mapping={"status": status, "updated_at": str(time.time()), **extra})

    def _get_tts(self):
        if self._tts is None:
            if self._tts_factory is None:
                from ..tts import ChatterboxTTS
                self._tts_factory = ChatterboxTTS.from_pretrained
            self._tts = self._tts_factory()
            if os.getenv("WORKER_WARMUP", "0") == "1" and hasattr(self._tts, "warmup"):
                # pre-compile the serving buckets before taking traffic;
                # deployments pin THEIR bucket lists via env so the warmed
                # programs are exactly the ones traffic will hit
                def _ints(key, default):
                    raw = os.getenv(key)
                    if not raw:
                        return default
                    return tuple(int(x) for x in raw.split(",") if x.strip())
                self._tts.warmup(
                    batch_sizes=_ints("WORKER_WARMUP_BATCHES", (1,)),
                    token_buckets=_ints("WORKER_WARMUP_TOKEN_BUCKETS", (256,)),
                    stream=os.getenv("WORKER_WARMUP_STREAM", "0") == "1")
            # multi-chip decode: WORKER_MESH=dpxtp (e.g. "2x4") shards
            # utterance rows over dp and the T3 backbone Megatron-style
            # over tp for every job this worker runs (tts.enable_mesh)
            mesh_spec = os.getenv("WORKER_MESH")
            if mesh_spec and hasattr(self._tts, "enable_mesh"):
                dp, tp = (int(x) for x in mesh_spec.lower().split("x"))
                self._tts.enable_mesh(n_devices=dp * tp, tp=tp)
        return self._tts

    def _get_vc(self):
        if self._vc is None:
            if self._vc_factory is None:
                from ..vc import ChatterboxVC
                self._vc_factory = ChatterboxVC.from_pretrained
            self._vc = self._vc_factory()
        return self._vc

    def process_message(self, mid: str, fields: Dict[str, str]) -> bool:
        payload = self.parse_payload(fields)
        job_id = payload.get("job_id", mid)
        job_type = payload.get("type", self.mode)
        self.set_status(job_id, "processing")
        try:
            if job_type == "tts":
                result = self._get_tts().generate_tts_story(**{
                    k: payload[k] for k in
                    ("story_id", "user_id", "text", "voice_profile_b64",
                     "voice_profile_r2_key", "language", "version_id",
                     "voice_id", "voice_name", "story_type", "is_kids_voice",
                     "pause_scale", "metadata", "exaggeration", "cfg_weight",
                     "temperature")
                    if k in payload})
            elif job_type == "vc":
                from ..vc import clone_voice
                result = clone_voice(self._get_vc(), **{
                    k: payload[k] for k in
                    ("voice_id", "voice_name", "user_id", "audio_b64", "audio_r2_key",
                     "language", "metadata")
                    if k in payload})
            else:
                raise ValueError(f"unknown job type: {job_type}")
            if isinstance(result, dict) and result.get("status") == "error":
                # jobs catch their own exceptions and report via the payload
                # (reference: tts.py:1790-1799); surface that as a job failure
                raise RuntimeError(result.get("error", "job reported error"))
            self.set_status(job_id, "done", result=json.dumps(result, default=str))
            return True
        except Exception as e:  # noqa: BLE001 — worker must survive bad jobs
            logger.exception("job %s failed", job_id)
            self.set_status(job_id, "error", error=str(e))
            self.client.xadd(DLQ_STREAM, {"source": self.stream, "job_id": job_id,
                                          "error": str(e)})
            return False

    def process_batch(self, items: List[Tuple[str, Dict[str, Any]]]) -> int:
        """Run several parsed TTS payloads as ONE pooled decode
        (jobs.generate_tts_stories_batch); per-job status/DLQ contract is
        identical to process_message. Returns the number handled."""
        from . import jobs
        for mid, payload in items:
            self.set_status(payload.get("job_id", mid), "processing")
        try:
            results = jobs.generate_tts_stories_batch(
                self._get_tts(), [p for _, p in items])
        except Exception as e:  # noqa: BLE001 — batch layer must survive
            logger.exception("batched job pass failed")
            results = [{"status": "error", "error": str(e)}] * len(items)
        for (mid, payload), result in zip(items, results):
            job_id = payload.get("job_id", mid)
            if isinstance(result, dict) and result.get("status") != "error":
                self.set_status(job_id, "done",
                                result=json.dumps(result, default=str))
            else:
                err = (result or {}).get("error", "job reported error")
                logger.error("job %s failed: %s", job_id, err)
                self.set_status(job_id, "error", error=str(err))
                self.client.xadd(DLQ_STREAM, {"source": self.stream,
                                              "job_id": job_id,
                                              "error": str(err)})
        return len(items)

    def run_once(self) -> int:
        """Process up to WORKER_MAX_BATCH messages; returns number handled.

        With WORKER_MAX_BATCH=1 (the default) this is the reference's
        one-job-at-a-time loop. Above 1, waiting TTS jobs are drained into
        one pooled multi-voice decode (dynamic batching — the chip's batch
        budget fills across jobs instead of idling at B=1); non-TTS or
        malformed messages keep the single-job path."""
        max_batch = int(os.getenv("WORKER_MAX_BATCH", "1"))
        msgs = self.client.xreadgroup(self.group, self.consumer,
                                      {self.stream: ">"}, count=max(1, max_batch),
                                      block=5000)
        entries = [(mid, fields) for _stream, es in msgs or [] for mid, fields in es]
        handled = 0
        batchable: List[Tuple[str, Dict[str, Any]]] = []
        for mid, fields in entries:
            payload = None
            if self.mode == "tts" and len(entries) > 1:
                try:
                    payload = self.parse_payload(fields)
                except Exception:  # noqa: BLE001 — fall through to single path
                    payload = None
            if payload is not None and payload.get("type", self.mode) == "tts":
                batchable.append((mid, payload))
            else:
                self.process_message(mid, fields)
                self.client.xack(self.stream, self.group, mid)
                handled += 1
        if len(batchable) == 1:
            mid, payload = batchable[0]
            self.process_message(mid, {"payload": json.dumps(payload)})
            self.client.xack(self.stream, self.group, mid)
            handled += 1
        elif batchable:
            handled += self.process_batch(batchable)
            for mid, _ in batchable:
                self.client.xack(self.stream, self.group, mid)
        return handled

    def run_forever(self):
        logger.info("worker %s consuming %s", self.consumer, self.stream)
        while True:
            try:
                self.run_once()
            except KeyboardInterrupt:
                break
            except Exception:  # noqa: BLE001
                logger.exception("worker loop error; backing off")
                time.sleep(1.0)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["tts", "vc"], default=os.getenv("WORKER_MODE", "tts"))
    args = ap.parse_args()
    RedisWorker(mode=args.mode).run_forever()


if __name__ == "__main__":
    main()
