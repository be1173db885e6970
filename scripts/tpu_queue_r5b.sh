#!/usr/bin/env bash
# Round-5 queue B: TTFA under continuous load (VERDICT r4 item 4) — the
# composed streamed-request path (ContinuousServer submit(stream=True) ->
# WindowedSynth) at 50% and 80% Poisson load, full size, real chip.
# Run AFTER tpu_queue_r5a.sh (one tunnel, quiet machine — the contention
# rule from PERF_NOTES applies).
set -u
cd "$(dirname "$0")/.."
mkdir -p measurements
export PYTHONPATH="/root/repo:/root/.axon_site"
QTAG=q5b
source "$(dirname "$0")/tpu_queue_lib.sh"
run_watched q5b_stream_under_load 2400 5400 3 \
  python scripts/stream_under_load_probe.py \
    --out measurements/q5b_stream_under_load.jsonl
echo "[q5b] done $(date +%H:%M:%S)" >&2
