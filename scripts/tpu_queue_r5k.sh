#!/usr/bin/env bash
# Round-5 queue K: near-idle TTFA floor of the streamed-continuous path
# (4 requests at 5% load) — the intrinsic engine-block + windowed-tail
# overhead vs stream_generate's 0.125 s fused first chunk, completing the
# serving-guidance table (idle fused < streamed idle < streamed loaded).
set -u
cd "$(dirname "$0")/.."
mkdir -p measurements
export PYTHONPATH="/root/repo:/root/.axon_site"
QTAG=q5k
source "$(dirname "$0")/tpu_queue_lib.sh"
run_watched q5k_stream_idle 2400 5400 3 \
  python scripts/stream_under_load_probe.py --loads 0.05 --requests 4 \
    --out measurements/q5k_stream_idle.jsonl
echo "[q5k] done $(date +%H:%M:%S)" >&2
