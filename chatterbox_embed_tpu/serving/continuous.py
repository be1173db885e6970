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
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import SPEECH_VOCAB_SIZE
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
                 retries: int = 1):
        self.tts = tts
        if slots is None:
            slots = min(16, t3_mod.max_decode_utterances())
        self.decoder = ContinuousDecoder(
            tts.t3_params, tts.cfg.t3, slots=slots, text_bucket=text_bucket,
            max_new_tokens=max_new_tokens, block=block, dtype=tts.dtype,
            kv_int8=kv_int8, use_top_p=use_top_p)
        self.vocode_batch = vocode_batch
        self.retries = retries
        self._meta: Dict[int, dict] = {}      # engine rid -> request meta
        self._ext_of: Dict[int, int] = {}     # engine rid -> external rid
        # completed, not yet vocoded: (ext rid, tokens, conds, seed)
        self._ready: List[Tuple[int, np.ndarray, object, int]] = []
        self._wavs: Dict[int, np.ndarray] = {}
        self._failed: Dict[int, str] = {}

    # -- submission -----------------------------------------------------

    def submit(self, text: str, conds=None, *, temperature: float = 0.6,
               cfg_weight: float = 0.3, repetition_penalty: float = 1.2,
               min_p: float = 0.05, top_p: float = 1.0,
               exaggeration: Optional[float] = None, seed: int = 0,
               max_new_tokens: Optional[int] = None) -> int:
        """Queue one utterance; returns an external request id. Results
        appear in pump()/drain() keyed by that id."""
        conds = conds if conds is not None else self.tts.conds
        assert conds is not None, "prepare conditionals (or pass conds=)"
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
        return rid

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
        out: Dict[int, np.ndarray] = {}
        if self._ready and (len(self._ready) >= self.vocode_batch
                            or self.decoder.idle):
            batch, self._ready = self._ready, []
            wavs, _lens = self.tts._vocode_batch(
                [t for _, t, _, _ in batch],
                conds_list=[c for _, _, c, _ in batch],
                seed=int(batch[0][3]))
            for (ext, _t, _c, _s), wav in zip(batch, wavs):
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
