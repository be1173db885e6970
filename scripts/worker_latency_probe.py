"""q4ac: WORKER-level request latency under Poisson arrivals.

q4aa measured the slot-refill engine's latency win at the T3-DECODE level
(6.5x mean / 36x p95); q4ab validated the continuous worker path
functionally. This probe closes the loop at the TRUE product boundary:
jobs arrive on the (in-memory) stream at Poisson times and are served by
the real RedisWorker loops — `run_continuous` (the round-4 default) vs
`run_once` pooling under WORKER_MAX_BATCH — including chunking, S3Gen
vocode, gates, stitch, watermark and storage. Latency = status-done time
minus stream-arrival time, per job.

Protocol: both cells use the SAME seeded arrival schedule at ~80% of the
continuous cell's measured capacity (calibrated by a warm all-at-once
pass, which also warms every program). Same geometry as the q4ab smoke so
its compiled programs are reused.

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site timeout 5400 \
    python scripts/worker_latency_probe.py [--smoke] \
        [--out measurements/q4ac_worker_latency.jsonl]
"""
from __future__ import annotations

import argparse
import base64
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("CHATTERBOX_LOCAL_STORAGE", "/tmp/q4ac_store")


class TimedStreams:
    """InMemoryStreams wrapper with a TIMED arrival schedule. Held messages
    become visible when their release time passes; when the consumer polls
    an empty stream and messages are still scheduled, the poll BLOCKS until
    the next release (like a real `xreadgroup block=`), so worker loops
    with `stop_when_drained` semantics never exit while arrivals remain."""

    def __init__(self, inner):
        self._inner = inner
        self._sched = []          # (t_rel, stream, fields, job_id) sorted
        self.arrivals = {}        # job_id -> wall time made visible

    def schedule(self, t_rel, stream, fields, job_id):
        self._sched.append((t_rel, stream, fields, job_id))
        self._sched.sort(key=lambda x: x[0])

    def start_clock(self):
        self._t0 = time.time()

    def _release_due(self):
        now = time.time() - self._t0
        while self._sched and self._sched[0][0] <= now:
            _t, stream, fields, jid = self._sched.pop(0)
            self._inner.xadd(stream, fields)
            self.arrivals[jid] = time.time()

    def xreadgroup(self, group, consumer, streams, count=1, block=0):
        self._release_due()
        out = self._inner.xreadgroup(group, consumer, streams, count=count,
                                     block=block)
        if not out and self._sched and block:
            # BLOCKING poll from an idle consumer while arrivals remain:
            # hold it until the next release (NOT capped at `block` — a
            # capped sleep lets stop_when_drained loops exit before the
            # first Poisson arrival, which is exactly the q4ac try-1..3
            # failure). A NON-blocking poll (block=None — the continuous
            # engine pumping live slots; redis BLOCK 0 would mean "forever")
            # must return immediately — sleeping there stalls the decode
            # loop and corrupts latencies.
            wait = self._sched[0][0] - (time.time() - self._t0)
            if wait > 0:
                time.sleep(wait + 1e-3)
            self._release_due()
            out = self._inner.xreadgroup(group, consumer, streams,
                                         count=count, block=block)
        return out

    def __getattr__(self, name):
        return getattr(self._inner, name)


def build_tts(smoke: bool):
    import jax
    import jax.numpy as jnp
    from chatterbox_embed_tpu.config import ChatterboxConfig
    from chatterbox_embed_tpu.models import s3gen as s3gen_mod
    from chatterbox_embed_tpu.models import t3 as t3_mod
    from chatterbox_embed_tpu.tts import ChatterboxTTS, _FallbackTokenizer
    from chatterbox_embed_tpu.utils.device import (enable_compilation_cache,
                                                   init_on_cpu,
                                                   to_default_device)
    from chatterbox_embed_tpu.utils.quantize import quantize_t3

    if smoke:
        import chatterbox_embed_tpu.models.t3 as t3mod
        import chatterbox_embed_tpu.tts as ttsmod
        from tests.test_pipeline import TINY
        t3mod._TEXT_BUCKETS = (24, 48)
        ttsmod._TOKEN_BUCKETS = (32, 64, 128)
        return ChatterboxTTS.from_random(seed=0, config=TINY), TINY
    enable_compilation_cache()
    cfg = ChatterboxConfig()
    k = jax.random.split(jax.random.PRNGKey(0), 2)
    t3_params = quantize_t3(init_on_cpu(t3_mod.init, k[0], cfg.t3))
    s3_params = init_on_cpu(s3gen_mod.init, k[1], cfg.s3gen)
    cast = lambda t: jax.tree.map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16) if x.dtype == np.float32 else x, t)
    t3_params = to_default_device(cast(t3_params))
    s3_params = to_default_device(cast(s3_params))
    jax.block_until_ready((t3_params, s3_params))
    return (ChatterboxTTS(t3_params, s3_params, None,
                          _FallbackTokenizer(cfg.t3), config=cfg,
                          dtype=jnp.bfloat16), cfg)


def make_profile_b64(cfg, seed: int, smoke: bool) -> str:
    from chatterbox_embed_tpu.models import s3gen as s3gen_mod
    r = np.random.default_rng(seed)
    n_prompt = 8 if smoke else 150
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
    path = f"/tmp/q4ac_voice_{seed}.npy"
    prof.save(path)
    with open(path, "rb") as f:
        return base64.b64encode(f.read()).decode()


class DoneTimes:
    """InMemoryStreams subclass-free completion recorder via hset wrap."""

    def __init__(self, inner):
        self.inner = inner
        self.done = {}

    def install(self):
        orig = self.inner.hset

        def hset(name, mapping):
            orig(name, mapping)
            if mapping.get("status") in ("done", "error") \
                    and name not in self.done:
                self.done[name] = (time.time(), mapping["status"])
        self.inner.hset = hset


def run_cell(mode, tts, jobs_payloads, schedule, smoke):
    """One timed cell. mode: 'continuous' | 'pooled'. schedule: job_id ->
    arrival offset seconds (0.0 everywhere = warm/calibration pass).
    Returns (latencies dict, makespan, errors)."""
    from chatterbox_embed_tpu.serving.worker import (RedisWorker,
                                                     InMemoryStreams,
                                                     STREAM_TTS)
    inner = InMemoryStreams()
    rec = DoneTimes(inner)
    rec.install()
    client = TimedStreams(inner)
    for jid, fields in jobs_payloads:
        client.schedule(schedule[jid], STREAM_TTS, fields, jid)
    worker = RedisWorker(mode="tts", client=client, tts_factory=lambda: tts)
    n = len(jobs_payloads)
    client.start_clock()
    t_begin = time.time()
    if mode == "continuous":
        worker.run_continuous(stop_when_drained=True)
    else:
        while len(rec.done) < n:
            if worker.run_once() == 0:
                time.sleep(0.05)
    if not rec.done:
        raise RuntimeError(f"{mode} cell finished no jobs")
    t_end = max(t for t, _ in rec.done.values())
    lat, errors = {}, []
    for jid, _fields in jobs_payloads:
        name = f"runpod:job:{jid}"
        t_done, status = rec.done[name]
        if status != "done":
            errors.append(jid)
        lat[jid] = t_done - client.arrivals[jid]
    return lat, t_end - t_begin, errors


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--jobs", type=int, default=12)
    ap.add_argument("--util", type=float, default=0.8)
    ap.add_argument("--out", default="measurements/q4ac_worker_latency.jsonl")
    args = ap.parse_args()

    if args.smoke:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.update(WORKER_SLOTS="2", WORKER_TEXT_BUCKET="24",
                          WORKER_BLOCK="8", WORKER_MAX_NEW_TOKENS="16",
                          WORKER_MAX_BATCH="2")
        args.jobs = min(args.jobs, 6)
    else:
        # q4ab geometry — its compiled programs are warm in the cache
        os.environ.setdefault("WORKER_SLOTS", "8")
        os.environ.setdefault("WORKER_TEXT_BUCKET", "384")
        os.environ.setdefault("WORKER_BLOCK", "64")
        os.environ.setdefault("WORKER_MAX_NEW_TOKENS", "220")
        os.environ.setdefault("WORKER_MAX_BATCH", "8")
    import jax
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    t0 = time.time()
    tts, cfg = build_tts(args.smoke)
    print(f"[q4ac] params {time.time() - t0:.1f}s", file=sys.stderr)

    voices = {1: make_profile_b64(cfg, 1, args.smoke),
              2: make_profile_b64(cfg, 2, args.smoke)}
    if args.smoke:
        texts = ["The knight rode far.", "The dragon was kind.",
                 "They became friends."]
    else:
        sent = ("The quick brown fox jumps over the lazy dog while the "
                "river keeps rolling toward the quiet valley below. ")
        texts = [sent * 3]
    jobs = []
    for i in range(args.jobs):
        jid = f"j{i:02d}"
        payload = {"job_id": jid, "type": "tts", "story_id": f"s{i}",
                   "user_id": "probe", "text": texts[i % len(texts)],
                   "voice_profile_b64": voices[1 + (i % 2)],
                   "exaggeration": 0.5}
        jobs.append((jid, {"payload": json.dumps(payload)}))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    out_f = open(args.out, "a")

    def emit(row):
        print(json.dumps(row))
        out_f.write(json.dumps(row) + "\n")
        out_f.flush()

    all_at_once = {jid: 0.0 for jid, _ in jobs}

    # -- warm + calibration: continuous, everything at t=0 ------------------
    _lat, makespan_c0, err = run_cell("continuous", tts, jobs, all_at_once,
                                      args.smoke)
    emit({"cell": "continuous_warm_all_at_once",
          "makespan_s": round(makespan_c0, 2), "errors": err})
    capacity = args.jobs / makespan_c0
    rate = args.util * capacity
    rng = np.random.default_rng(7)
    offsets = np.cumsum(rng.exponential(1.0 / rate, args.jobs))
    schedule = {jid: float(t) for (jid, _), t in zip(jobs, offsets)}
    emit({"cell": "schedule", "capacity_jobs_per_s": round(capacity, 4),
          "rate_jobs_per_s": round(rate, 4),
          "span_s": round(float(offsets[-1]), 1)})

    # -- warm pooled (compiles the batched pooled path) ----------------------
    _lat, makespan_p0, err = run_cell("pooled", tts, jobs, all_at_once,
                                      args.smoke)
    emit({"cell": "pooled_warm_all_at_once",
          "makespan_s": round(makespan_p0, 2), "errors": err})

    # -- timed cells, same Poisson schedule ----------------------------------
    failed = False
    for mode in ("pooled", "continuous"):
        try:
            lat, makespan, err = run_cell(mode, tts, jobs, schedule,
                                          args.smoke)
        except Exception as e:  # noqa: BLE001 - record, keep the other cell
            emit({"cell": f"{mode}_poisson", "exception": repr(e)[:500]})
            failed = True
            continue
        vals = np.asarray(sorted(lat.values()))
        emit({"cell": f"{mode}_poisson", "jobs": args.jobs,
              "mean_latency_s": round(float(vals.mean()), 3),
              "p95_latency_s": round(float(np.percentile(vals, 95)), 3),
              "max_latency_s": round(float(vals.max()), 3),
              "makespan_s": round(makespan, 2), "errors": err})
    out_f.close()
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
