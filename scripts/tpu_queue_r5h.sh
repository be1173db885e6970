#!/usr/bin/env bash
# Round-5 queue H: block-size sensitivity of streamed TTFA under load.
# q5b measured block 25 (TTFA p50 1.14/1.34 s at 50/80%); the WORKER_BLOCK
# default is 64 — this cell measures the same 80% load at block 64 so the
# docs/CONFIG.md guidance ("stream latency-critical requests with a small
# engine block") stands on an A/B rather than an inference.
set -u
cd "$(dirname "$0")/.."
mkdir -p measurements
export PYTHONPATH="/root/repo:/root/.axon_site"
QTAG=q5h
source "$(dirname "$0")/tpu_queue_lib.sh"
run_watched q5h_stream_block64 2400 5400 3 \
  python scripts/stream_under_load_probe.py --block 64 --loads 0.8 \
    --out measurements/q5h_stream_block64.jsonl
echo "[q5h] done $(date +%H:%M:%S)" >&2
