#!/usr/bin/env bash
# Round-5 queue D: the DRIVER-DEFAULT bench invocation (`python bench.py`,
# no args) — one session, three headline cells (B=1 RTF, B=32 RTF,
# streaming TTFA p50). Validates exactly what the driver runs for
# BENCH_r05.json and records the three-cell JSON under measurements/.
set -u
cd "$(dirname "$0")/.."
mkdir -p measurements
export PYTHONPATH="/root/repo:/root/.axon_site"
QTAG=q5d
source "$(dirname "$0")/tpu_queue_lib.sh"
run_watched q5d_bench_default 2400 5400 3 \
  python bench.py
echo "[q5d] done $(date +%H:%M:%S)" >&2
