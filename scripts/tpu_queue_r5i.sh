#!/usr/bin/env bash
# Round-5 queue I: quiet-machine re-check of the b32 x 250 headline cell
# (q5d same-session draw was RTF 0.0144 vs the q4af 0.0133 — classify as
# scatter or regression, the q5f pattern).
set -u
cd "$(dirname "$0")/.."
mkdir -p measurements
export PYTHONPATH="/root/repo:/root/.axon_site"
QTAG=q5i
source "$(dirname "$0")/tpu_queue_lib.sh"
run_watched q5i_b32_quiet 2400 4200 3 \
  python bench.py --batch 32 --iters 5
echo "[q5i] done $(date +%H:%M:%S)" >&2
