#!/usr/bin/env bash
# Round-5 queue A: validate the prefix-read phased cache (the q4ah crash
# fix) on hardware at the shapes that matter:
#   1. b32 x 1000-token cap — the cell that CRASHED the TPU worker 3/3
#      under the round-4 grow_cache migration (measurements/q4ah_*.err);
#      must now run green under the shipped derived default.
#   2. b32 x 1000 with CHATTERBOX_PHASED_CACHE=0 — unphased baseline for
#      the win magnitude at the fence shape.
#   3/4. b16 x 1000 derived vs off — re-validate the q4ag -28.4%/step win
#      under the new implementation; per-iter t3/s3gen stage arrays in the
#      bench JSON attribute the q4ag s3gen variance (phased == unphased
#      bit-identically, so any s3gen_s delta is pure session variance).
#   5/6. b16 x 600 derived vs off — the intermediate-cap point the round-4
#      advisor flagged as extrapolated (600 is the derivation threshold).
set -u
cd "$(dirname "$0")/.."
mkdir -p measurements
export PYTHONPATH="/root/repo:/root/.axon_site"
QTAG=q5a
source "$(dirname "$0")/tpu_queue_lib.sh"
run_watched q5a_b32_t1000_derived 2400 4500 3 \
  python bench.py --batch 32 --tokens 1000 --iters 3
run_watched q5a_b32_t1000_off 2400 4500 3 \
  env CHATTERBOX_PHASED_CACHE=0 python bench.py --batch 32 --tokens 1000 --iters 3
run_watched q5a_b16_t1000_derived 2400 4200 3 \
  python bench.py --batch 16 --tokens 1000 --iters 4
run_watched q5a_b16_t1000_off 2400 4200 3 \
  env CHATTERBOX_PHASED_CACHE=0 python bench.py --batch 16 --tokens 1000 --iters 4
run_watched q5a_b16_t600_derived 2400 4200 3 \
  python bench.py --batch 16 --tokens 600 --iters 4
run_watched q5a_b16_t600_off 2400 4200 3 \
  env CHATTERBOX_PHASED_CACHE=0 python bench.py --batch 16 --tokens 600 --iters 4
echo "[q5a] done $(date +%H:%M:%S)" >&2
