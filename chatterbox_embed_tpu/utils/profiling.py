"""Observability: per-stage wall timers + optional jax.profiler traces
(reference had only ad-hoc wall-clock logs — tts.py:1077,1313-1316,1363;
SURVEY.md §5 asks the rebuild for jax.profiler + per-stage timers while
keeping the metadata dict shape)."""
from __future__ import annotations

import contextlib
import logging
import os
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax

logger = logging.getLogger(__name__)


class StageTimers:
    """Accumulates per-stage wall time; exposes the reference-style
    audio_duration/generation_time ratio."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": round(v, 4), "count": self.counts[k],
                    "mean_s": round(v / max(self.counts[k], 1), 4)}
                for k, v in sorted(self.totals.items())}

    def log(self, prefix: str = "perf"):
        for k, s in self.summary().items():
            logger.info("%s | %s: %.3fs over %d calls", prefix, k,
                        s["total_s"], s["count"])


@contextlib.contextmanager
def trace(name: str = "chatterbox", log_dir: Optional[str] = None) -> Iterator[None]:
    """jax.profiler trace context, gated by CHATTERBOX_PROFILE_DIR or arg.
    View with TensorBoard / xprof."""
    log_dir = log_dir or os.getenv("CHATTERBOX_PROFILE_DIR")
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        with jax.profiler.TraceAnnotation(name):
            yield


def annotate(name: str):
    """Named region inside a trace (shows up on the xprof timeline)."""
    return jax.profiler.TraceAnnotation(name)
