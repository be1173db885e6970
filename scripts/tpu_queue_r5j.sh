#!/usr/bin/env bash
# Round-5 queue J: OVERLOAD behavior of the streamed continuous server —
# Poisson arrivals at 120% of measured decode capacity. The question is
# graceful degradation: all requests must complete with finite audio, TTFA
# p50 should stay near the loaded-but-stable band (slots saturate, the
# queue absorbs the excess), and the p95 tail shows the queue growth.
set -u
cd "$(dirname "$0")/.."
mkdir -p measurements
export PYTHONPATH="/root/repo:/root/.axon_site"
QTAG=q5j
source "$(dirname "$0")/tpu_queue_lib.sh"
run_watched q5j_stream_overload 2400 5400 3 \
  python scripts/stream_under_load_probe.py --loads 1.2 --requests 32 \
    --out measurements/q5j_stream_overload.jsonl
echo "[q5j] done $(date +%H:%M:%S)" >&2
