#!/usr/bin/env bash
# Round-5 queue G: phase-LENGTH sweep at the b16 x 1000-cap cell. The q5a
# derived default (K=4, ~256-token phases) wins -27.5%/step; the only other
# measured phase-length points are 64-token phases (lose, q4s, short cap).
# Same-session A/B of K=4 (control) vs K=8 (~128-token phases, avg read
# ~8% lower) vs K=3 (~384-token phases) decides whether the ceil(cap/256)
# derivation shape is at its optimum.
set -u
cd "$(dirname "$0")/.."
mkdir -p measurements
export PYTHONPATH="/root/repo:/root/.axon_site"
QTAG=q5g
source "$(dirname "$0")/tpu_queue_lib.sh"
run_watched q5g_b16_t1000_k4 2400 4200 3 \
  python bench.py --batch 16 --tokens 1000 --iters 4
run_watched q5g_b16_t1000_k8 2400 4200 3 \
  env CHATTERBOX_PHASED_CACHE=8 python bench.py --batch 16 --tokens 1000 --iters 4
run_watched q5g_b16_t1000_k3 2400 4200 3 \
  env CHATTERBOX_PHASED_CACHE=3 python bench.py --batch 16 --tokens 1000 --iters 4
echo "[q5g] done $(date +%H:%M:%S)" >&2
