"""Continuous-batching TTS server: request-stream serving on the slot-refill
T3 decode engine (models/t3_engine.py) with opportunistic S3Gen batching.

The worker's WORKER_MAX_BATCH pooling batches jobs that are ALREADY waiting
when a batch forms, then decodes them in lock-step: a short row idles until
the block's EOS early-exit fires, and requests that arrive mid-decode wait
for the next pool. This server keeps the chip's decode slots continuously
full instead — requests join a RUNNING decode the moment a slot frees
(vLLM-style continuous batching; the reference is hard-limited to batch 1,
reference tts.py generate loop / SURVEY.md §2.6, so this has no counterpart
there — it was COMPONENTS.md round-4 "Future work").

Flow per request: text -> tokenizer -> engine slot (T3 tokens, voice
conditioning prefilled into the slot's KV columns) -> completion -> S3Gen
vocode. Vocoding batches opportunistically across whatever requests completed
recently (`vocode_batch` threshold, flushed when the engine idles) through
the same `tts._vocode_batch` tail the lock-step path uses — multi-voice
ragged prompts included.

Determinism contract: token streams are per-request deterministic
(engine RNG = fold_in(PRNGKey(request_seed), step), independent of traffic);
wavs additionally depend on the vocode batch composition only through the
shared noise key of `token_to_wav` — pass distinct seeds per request for
fully independent audio noise.

Designed for real TPU hosts where the per-block host round-trip is
microseconds; through the dev tunnel each block costs one RTT (pick `block`
accordingly — see PERF_NOTES.md continuous-batching section).
"""
from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import SPEECH_VOCAB_SIZE
from ..models import llama, t3_engine
from ..models import t3 as t3_mod
from ..models.t3_engine import ContinuousDecoder

logger = logging.getLogger(__name__)

# below this many cleaned speech tokens a decode is considered failed
# (tts._guard_tokens semantics) and the request is retried with a drifted
# seed, mirroring the lock-step retry pyramid's first rung
MIN_TOKENS = 8


class ContinuousServer:
    """Submit/pump/drain server over a ChatterboxTTS instance.

    Args:
      tts: a ChatterboxTTS (weights + tokenizer + s3gen pipeline).
      slots: concurrent decode slots (engine batch = 2*slots CFG rows).
        Defaults to t3.max_decode_utterances() capped at 16.
      text_bucket: engine-wide text width; requests longer than this are
        rejected at submit (the long-text chunker keeps chunks well under
        typical buckets).
      max_new_tokens: engine cache headroom per slot (requests may ask less).
      block: decode-block size between refill checks — the latency/RTT
        trade: a freed slot refills only at block boundaries.
      vocode_batch: completed requests are vocoded once this many are ready
        (or the engine goes idle).
      retries: seed-drift retries for too-short decodes.
    """

    def __init__(self, tts, *, slots: Optional[int] = None,
                 text_bucket: int = 192, max_new_tokens: int = 600,
                 block: int = 64, vocode_batch: int = 8,
                 use_top_p: bool = False, kv_int8: Optional[bool] = None,
                 retries: int = 1, retain_wavs: bool = True):
        self.tts = tts
        mesh = getattr(tts, "mesh", None)
        dp = dict(mesh.shape).get("dp", 1) if mesh is not None else 1
        if slots is None:
            # the decode-utterance fence is PER-CHIP HBM (KV-bytes bounded,
            # so long caps derive fewer slots), and a dp mesh hosts dp x the
            # slots (each chip holds slots/dp of them). Size against the
            # cache the engine will ACTUALLY allocate: an explicit kv_int8
            # argument must override the ambient env-derived mode.
            eff_int8 = (llama._kv_int8_mode() > 0 if kv_int8 is None
                        else kv_int8)
            _, capacity = t3_engine.engine_geometry(
                tts.cfg.t3, text_bucket,
                2 + tts.cfg.t3.perceiver_num_queries, max_new_tokens)
            slots = min(16, t3_mod.max_decode_utterances(
                capacity, cfg=tts.cfg.t3, kv_int8=eff_int8)) * dp
        elif dp > 1 and slots % dp != 0:
            raise ValueError(f"slots={slots} must be a multiple of the dp "
                             f"axis ({dp}) — each chip hosts slots/dp slots")
        self.decoder = ContinuousDecoder(
            tts.t3_params, tts.cfg.t3, slots=slots, text_bucket=text_bucket,
            max_new_tokens=max_new_tokens, block=block, dtype=tts.dtype,
            kv_int8=kv_int8, use_top_p=use_top_p, mesh=mesh,
            retain_results=False)
        self.vocode_batch = vocode_batch
        self.retries = retries
        # a run-forever caller (the continuous worker) consumes results from
        # pump()'s return value — retain_wavs=False keeps this server from
        # accumulating every wav ever generated (drain() callers keep True)
        self.retain_wavs = retain_wavs
        self._meta: Dict[int, dict] = {}      # engine rid -> request meta
        self._ext_of: Dict[int, int] = {}     # engine rid -> external rid
        # completed, not yet vocoded: (ext rid, tokens, conds, seed)
        self._ready: List[Tuple[int, np.ndarray, object, int]] = []
        self._wavs: Dict[int, np.ndarray] = {}
        self._failed: Dict[int, str] = {}
        # STREAMED requests (submit(..., stream=True)): each one carries a
        # windowed flow/vocoder tail (streaming.WindowedSynth — the same
        # loop stream_generate runs) fed from its engine slot's per-block
        # tokens, so first audio arrives while the request is still
        # decoding even on a busy engine (round-5 VERDICT item 4)
        self._streams: Dict[int, object] = {}          # engine rid -> synth
        self._schunks: Dict[int, List[np.ndarray]] = {}  # ext -> chunks
        self._staken: Dict[int, int] = {}
        self._sdone: set = set()
        # requests whose consumer has actually called take_stream: only
        # their chunk buffers survive completion (for the final take); a
        # pump()-only consumer gets the full wav from pump's return and its
        # buffers are freed at completion — otherwise a run-forever worker
        # would retain every streamed request's audio (host-memory leak,
        # the retain_wavs=False failure class)
        self._stouched: set = set()

    # -- submission -----------------------------------------------------

    def submit(self, text: str, conds=None, *, temperature: float = 0.6,
               cfg_weight: float = 0.3, repetition_penalty: float = 1.2,
               min_p: float = 0.05, top_p: float = 1.0,
               exaggeration: Optional[float] = None, seed: int = 0,
               max_new_tokens: Optional[int] = None,
               stream: bool = False,
               stream_block_tokens: Optional[int] = None) -> int:
        """Queue one utterance; returns an external request id. Results
        appear in pump()/drain() keyed by that id.

        stream=True: the request's audio is synthesised INCREMENTALLY — a
        windowed flow/vocoder tail consumes the slot's per-block tokens, so
        first audio is available (via take_stream) after the request's
        first engine block instead of after its full decode + batch vocode.
        The completed wav returned by pump()/drain() is the concatenation
        of the streamed chunks. Streamed requests skip the seed-drift retry
        (chunks already left the building) and the batched vocode.
        stream_block_tokens sets the doubling schedule's first group size
        (default: the engine block size — first audio after one block)."""
        conds = conds if conds is not None else self.tts.conds
        assert conds is not None, "prepare conditionals (or pass conds=)"
        if stream and getattr(self.tts, "mesh", None) is not None:
            # the windowed flow/vocoder tail is single-chip (same constraint
            # as stream_generate, which clones an unmeshed instance); a
            # mesh-enabled server must route streamed requests to a
            # dedicated single-chip process instead
            raise ValueError(
                "submit(stream=True) is not supported on a mesh-enabled "
                "server — streaming synthesis is single-chip "
                "(tts.stream_generate docstring); run streamed requests on "
                "an unmeshed ContinuousServer")
        sot = self.tts.cfg.t3.start_text_token
        eot = self.tts.cfg.t3.stop_text_token
        tok = self.tts.tokenizer.text_to_tokens(text)[0]
        text_tokens = np.concatenate([[sot], tok, [eot]]).astype(np.int32)[None]
        t3c = conds.t3
        if exaggeration is not None:
            t3c = t3c._replace(emotion_adv=jnp.float32(exaggeration))
        req = dict(text_tokens=text_tokens, t3c=t3c, conds=conds,
                   temperature=temperature, cfg_weight=cfg_weight,
                   repetition_penalty=repetition_penalty, min_p=min_p,
                   top_p=top_p, seed=seed, max_new_tokens=max_new_tokens,
                   tries=0)
        rid = self._submit_engine(req)
        self._ext_of[rid] = rid
        if stream:
            import jax
            from ..streaming import WindowedSynth
            dev = self.tts._gen_device(conds.gen)
            self._streams[rid] = WindowedSynth(
                self.tts.s3gen_params, dev["prompt_token"],
                dev["prompt_feat"], dev["embedding"],
                phase_key=jax.random.PRNGKey(seed), cfg=self.tts.cfg,
                dtype=self.tts.dtype,
                block_tokens=stream_block_tokens or self.decoder.block)
            self._schunks[rid] = []
            self._staken[rid] = 0
        return rid

    def take_stream(self, ext: int) -> List[np.ndarray]:
        """New audio chunks of a streamed request since the last call (empty
        when nothing new). After the request completes, the final call
        returns the remaining chunks and releases the buffers. Consumers
        that never call this before the request completes (pump-only) get
        the full wav from pump()'s return instead — their chunk buffers are
        freed at completion, so a late first take_stream returns []."""
        self._stouched.add(ext)
        ch = self._schunks.get(ext)
        if ch is None:
            return []
        k = self._staken.get(ext, 0)
        new = ch[k:]
        if ext in self._sdone:
            self._schunks.pop(ext, None)
            self._staken.pop(ext, None)
            self._sdone.discard(ext)
            self._stouched.discard(ext)
        else:
            self._staken[ext] = len(ch)
        return new

    def _submit_engine(self, req: dict) -> int:
        rid = self.decoder.submit(
            req["text_tokens"], req["t3c"], temperature=req["temperature"],
            cfg_weight=req["cfg_weight"],
            repetition_penalty=req["repetition_penalty"], min_p=req["min_p"],
            top_p=req["top_p"], seed=req["seed"] + 1000 * req["tries"],
            max_new_tokens=req["max_new_tokens"])
        self._meta[rid] = req
        return rid

    # -- serving loop -----------------------------------------------------

    @property
    def idle(self) -> bool:
        return self.decoder.idle and not self._ready

    def pump(self) -> Dict[int, np.ndarray]:
        """One engine block + any vocode flush. Returns {external rid: wav}
        for requests whose audio finished this call."""
        done = self.decoder.step()
        out: Dict[int, np.ndarray] = {}
        # streamed requests: feed this block's tokens into each request's
        # windowed tail; the synthesis dispatches interleave with the next
        # engine block (honest single-chip accounting — flow/vocode compute
        # shares the chip with decode, exactly as it would in production)
        for rid, synth in list(self._streams.items()):
            toks = self.decoder.last_block_tokens.get(rid)
            ext = self._ext_of.get(rid, rid)
            if toks is not None and toks.size:
                self._schunks[ext].extend(synth.feed(toks))
            if rid in done:
                self._schunks[ext].extend(synth.finish())
                del self._streams[rid]
                self._meta.pop(rid, None)
                self._ext_of.pop(rid, None)
                chunks = self._schunks[ext]
                wav = (np.concatenate(chunks) if chunks
                       else np.zeros((0,), np.float32))
                if ext in self._stouched:
                    # an active take_stream consumer: keep the untaken tail
                    # for their final call (which releases the buffers)
                    self._sdone.add(ext)
                else:
                    # pump()-only consumer: the full wav is delivered via
                    # the return value below — free the chunk buffers now
                    self._schunks.pop(ext, None)
                    self._staken.pop(ext, None)
                if wav.size == 0:
                    self._failed[ext] = "empty streamed decode"
                else:
                    if self.retain_wavs:
                        self._wavs[ext] = wav
                    out[ext] = wav
                del done[rid]
        for rid, toks in done.items():
            req = self._meta.pop(rid)
            ext = self._ext_of.pop(rid)
            clean = toks[toks < SPEECH_VOCAB_SIZE]
            if clean.size < MIN_TOKENS and req["tries"] < self.retries:
                req["tries"] += 1
                logger.warning("request %s produced %d tokens; retrying "
                               "(%d/%d)", ext, clean.size, req["tries"],
                               self.retries)
                new_rid = self._submit_engine(req)
                self._ext_of[new_rid] = ext
                continue
            if clean.size == 0:
                self._failed[ext] = "empty decode after retries"
                continue
            self._ready.append((ext, toks, req["conds"], req["seed"]))
        if self._ready and (len(self._ready) >= self.vocode_batch
                            or self.decoder.idle):
            batch, self._ready = self._ready, []
            try:
                wavs, _lens = self.tts._vocode_batch(
                    [t for _, t, _, _ in batch],
                    conds_list=[c for _, _, c, _ in batch],
                    seed=int(batch[0][3]))
            except Exception:
                # a transient vocode failure (OOM, tunnel wedge) must not
                # lose the completed decodes — restore them so the next
                # pump (or a rebuilt server's caller) can retry the flush
                self._ready = batch + self._ready
                raise
            for (ext, _t, _c, _s), wav in zip(batch, wavs):
                if self.retain_wavs:
                    self._wavs[ext] = wav
                out[ext] = wav
        return out

    def drain(self) -> Dict[int, np.ndarray]:
        """Run until every submitted request has audio (or failed); returns
        all wavs accumulated so far. Failures are in .failed."""
        while not self.idle:
            self.pump()
        return dict(self._wavs)

    @property
    def failed(self) -> Dict[int, str]:
        return dict(self._failed)

    def take_failures(self) -> Dict[int, str]:
        """Pop and return failures recorded since the last call — the
        pump-loop failure channel for run-forever callers (the `.failed`
        view keeps accumulating for drain()-style use)."""
        out, self._failed = self._failed, {}
        return out


# ---------------------------------------------------------------------------
# job-level continuous serving (whole stories through the engine)
# ---------------------------------------------------------------------------

@dataclass
class _StoryJob:
    """One in-flight story: its chunks ride the engine independently."""
    chunks: list                               # List[ChunkInfo]
    per_chunk: List[Dict[str, float]]          # adaptive params per chunk
    conds: Any                                 # Conditionals
    seed: int
    pause_scale: Optional[float]
    t0: float
    max_new: Optional[int] = None
    wavs: List[Optional[np.ndarray]] = field(default_factory=list)
    last_wav: List[Optional[np.ndarray]] = field(default_factory=list)
    attempts: List[int] = field(default_factory=list)
    pending: int = 0
    regenerations: int = 0


class ContinuousStoryServer:
    """Arrival-driven STORY serving on the slot-refill engine.

    The lock-step story paths (`tts.generate_long_text` /
    `jobs.generate_tts_stories_batch` under WORKER_MAX_BATCH) decode a fixed
    pool: a story that arrives mid-decode waits for the whole pool. Here
    whole stories stream through one persistent engine — each story is
    chunked on arrival and its chunks join the RUNNING decode at the next
    block boundary (measured 6.5x mean / 36x p95 latency win under Poisson
    arrivals, PERF_NOTES.md q4aa). Quality semantics match the lock-step
    pipeline chunk-for-chunk:

    - per-chunk adaptive params: the same `tts._adaptive_chunk_params`
      blend (reference tts.py:1074-1096);
    - acceptance gates: the same `tts._chunk_gates_ok` (silence hard gate +
      QA regen, reference tts.py:1114-1124,1236-1285) plus the >= 8-token
      minimum, applied as each chunk's audio lands;
    - retries: failed chunks RE-ENTER the engine with the sequential
      pyramid's exact param drift and seed schedule
      (seed + attempt*1000 + chunk id, temperature/cfg/exaggeration drift —
      reference tts.py:1199-1206) instead of blocking the loop;
    - finalize: stitch + watermark + metadata identical to
      `generate_long_text` (reference tts.py:1409-1484), emitted the moment
      a story's last chunk passes its gates.

    The engine is multi-voice by construction (conditioning lives in each
    slot's KV columns), so concurrent stories may carry different voices.
    """

    def __init__(self, tts, *, slots: Optional[int] = None,
                 text_bucket: int = 256, max_new_tokens: int = 1000,
                 block: int = 64, vocode_batch: int = 4,
                 max_attempts: Optional[int] = None):
        self.tts = tts
        self.srv = ContinuousServer(
            tts, slots=slots, text_bucket=text_bucket,
            max_new_tokens=max_new_tokens, block=block,
            vocode_batch=vocode_batch, use_top_p=True, retries=1,
            retain_wavs=False)  # this layer owns result lifetimes
        self.text_bucket = text_bucket
        self.max_attempts = (int(os.getenv("CHATTERBOX_CHUNK_REGEN_ATTEMPTS",
                                           "4"))
                             if max_attempts is None else max_attempts)
        self._jobs: Dict[int, _StoryJob] = {}
        self._rid_map: Dict[int, Tuple[int, int, int]] = {}  # rid -> (jid, ci, attempt)
        self._next_jid = 0

    # -- submission ---------------------------------------------------------

    def submit_story(self, text: str, conds, *, exaggeration: float = 0.5,
                     cfg_weight: float = 0.6, temperature: float = 0.7,
                     target_chars: int = 400, max_chars: int = 600,
                     seed: int = 0, pause_scale: Optional[float] = None,
                     max_new_tokens: Optional[int] = None,
                     adaptive_voice_param_blend: float = 0.2) -> int:
        """Chunk one story and queue every chunk; returns a job id whose
        (wav, metadata) appears in pump()/drain(). Raises before touching the
        engine if the story is unsynthesisable or any chunk exceeds the
        engine's text bucket (callers fall back to the lock-step path)."""
        tts = self.tts
        chunks = tts.chunk_text(text, target_chars, max_chars)
        if not chunks:
            raise ValueError("no synthesisable text after sanitisation")
        base = dict(exaggeration=exaggeration, cfg_weight=cfg_weight,
                    temperature=temperature, repetition_penalty=1.2,
                    min_p=0.05, top_p=1.0)
        blend = tts.experiment_config.get("force_adaptive_blend")
        if blend is None:
            blend = adaptive_voice_param_blend
        per_chunk = tts._adaptive_chunk_params(chunks, base, blend)
        # atomic pre-check: nothing is submitted if any chunk won't fit
        for info in chunks:
            n_tok = len(tts.tokenizer.text_to_tokens(info.text)[0]) + 2
            if n_tok > self.text_bucket:
                raise ValueError(
                    f"chunk {info.id} is {n_tok} tokens; engine bucket is "
                    f"{self.text_bucket} — use the lock-step path or a wider "
                    "engine")
        jid = self._next_jid
        self._next_jid += 1
        n = len(chunks)
        job = _StoryJob(chunks=chunks, per_chunk=per_chunk, conds=conds,
                        seed=seed, pause_scale=pause_scale, t0=time.time(),
                        max_new=max_new_tokens, wavs=[None] * n,
                        last_wav=[None] * n, attempts=[0] * n, pending=n)
        self._jobs[jid] = job
        for ci in range(n):
            self._submit_chunk(jid, ci, attempt=0)
        return jid

    def _submit_chunk(self, jid: int, ci: int, attempt: int):
        job = self._jobs[jid]
        info = job.chunks[ci]
        p = dict(job.per_chunk[ci])
        if attempt > 0 and self.tts.experiment_config.get(
                "enable_retry_param_drift", True):
            # the sequential pyramid's retry drift (reference tts.py:1199-1206)
            p["temperature"] = max(0.5, p["temperature"] - 0.08 * attempt)
            p["cfg_weight"] = min(0.8, p["cfg_weight"] + 0.08 * attempt)
            p["exaggeration"] = max(0.1, p["exaggeration"] - 0.05 * attempt)
        rid = self.srv.submit(
            info.text, job.conds, temperature=p["temperature"],
            cfg_weight=p["cfg_weight"],
            repetition_penalty=p["repetition_penalty"], min_p=p["min_p"],
            top_p=p["top_p"], exaggeration=p.get("exaggeration"),
            seed=job.seed + attempt * 1000 + info.id,
            max_new_tokens=job.max_new)
        self._rid_map[rid] = (jid, ci, attempt)

    # -- serving loop -------------------------------------------------------

    @property
    def idle(self) -> bool:
        return not self._jobs and self.srv.idle

    def pump(self) -> Dict[int, Tuple[np.ndarray, Dict[str, Any]]]:
        """One engine block; gates any chunk audio that landed; returns
        {job id: (wav (1, T), metadata)} for stories that finished."""
        finished = dict(self.srv.pump())
        # engine-level failures (empty decode after the inner retry) gate
        # like silent takes: re-enter with drift or exhaust to the fallback
        for rid in self.srv.take_failures():
            finished[rid] = None
        out: Dict[int, Tuple[np.ndarray, Dict[str, Any]]] = {}
        for rid, wav in finished.items():
            if rid not in self._rid_map:   # ownerless result — never ours
                logger.warning("dropping result for unknown request %s", rid)
                continue
            jid, ci, attempt = self._rid_map.pop(rid)
            job = self._jobs[jid]
            if self._gate_chunk(jid, job, ci, attempt, wav):
                job.pending -= 1
            if job.pending == 0:
                out[jid] = self._finalize(jid, job)
        return out

    def _gate_chunk(self, jid: int, job: _StoryJob, ci: int, attempt: int,
                    wav: Optional[np.ndarray]) -> bool:
        """Accept/retry one landed chunk take; True when the chunk is done.
        Mirrors tts._generate_single_chunk_with_quality's accept rules."""
        info = job.chunks[ci]
        flat = None if wav is None else np.asarray(wav).reshape(-1)
        if flat is not None:
            job.last_wav[ci] = flat
        job.attempts[ci] = attempt + 1
        # the sequential path's _guard_tokens floor in samples
        # (>= 8 speech tokens x 2 mel frames x 480-sample hop)
        if flat is None or flat.size < 8 * 2 * 480:
            ok, reason = False, "silence"
        else:
            ok, reason = self.tts._chunk_gates_ok(flat, info)
        last_try = attempt >= self.max_attempts - 1
        if ok or (reason == "qa" and last_try):
            job.wavs[ci] = flat
            return True
        if not last_try:
            logger.info("job %d chunk %d %s — re-entering the engine "
                        "(attempt %d/%d)", jid, ci, reason or "retry",
                        attempt + 2, self.max_attempts)
            job.regenerations += 1
            self._submit_chunk(jid, ci, attempt + 1)
            return False
        # exhausted: keep the best take (even a silent one beats a gap —
        # reference tts.py:1268-1285), else half a second of silence
        job.wavs[ci] = (job.last_wav[ci] if job.last_wav[ci] is not None
                        else np.zeros(self.tts.sr // 2, np.float32))
        logger.warning("job %d chunk %d failed after %d attempts; keeping "
                       "best take", jid, ci, self.max_attempts)
        return True

    def _finalize(self, jid: int,
                  job: _StoryJob) -> Tuple[np.ndarray, Dict[str, Any]]:
        """Stitch + watermark + metadata, identical to generate_long_text
        (reference tts.py:1409-1484)."""
        tts = self.tts
        del self._jobs[jid]
        stitcher = tts.advanced_stitcher
        prev = stitcher.global_pause_factor
        if job.pause_scale is not None:
            stitcher.global_pause_factor = job.pause_scale
        try:
            wav, sr, duration = tts.stitch_and_normalize(job.wavs, job.chunks)
        finally:
            stitcher.global_pause_factor = prev
        wav = tts.watermarker.apply_watermark(wav, sample_rate=sr)
        total = time.time() - job.t0
        eng = self.srv.decoder
        metadata = {
            "runtime_version": _runtime_version(),
            "num_chunks": len(job.chunks),
            "duration_s": duration,
            "generation_time_s": total,
            "audio_ratio": duration / total if total > 0 else 0.0,
            "cache_stats": tts.get_conditional_cache_stats(),
            "chunk_stats": {
                "chunks": [{"id": info.id, "attempts": job.attempts[i],
                            "samples": int(job.wavs[i].size),
                            "params": job.per_chunk[i]}
                           for i, info in enumerate(job.chunks)],
                "regenerations": job.regenerations,
                "continuous": True,
            },
            # engine-level counters (shared across interleaved jobs — wall
            # attribution per job is not separable by design)
            "engine": {"blocks_run": eng.blocks_run,
                       "steps_run": eng.steps_run,
                       "slots": eng.slots},
        }
        return wav[None, :], metadata

    def drain(self) -> Dict[int, Tuple[np.ndarray, Dict[str, Any]]]:
        """Run until every submitted story has audio; returns all of them."""
        out: Dict[int, Tuple[np.ndarray, Dict[str, Any]]] = {}
        while not self.idle:
            out.update(self.pump())
        return out


def _runtime_version() -> str:
    from ..tts import CHATTERBOX_RUNTIME_VERSION
    return CHATTERBOX_RUNTIME_VERSION
