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
probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
x = (jnp.ones((128,128)) @ jnp.ones((128,128))).block_until_ready()" >/dev/null 2>&1
}
wait_tunnel() {
  local n=0
  until probe; do
    n=$((n+1)); echo "[q5a] tunnel down, retry $n $(date +%H:%M:%S)" >&2
    sleep 150
    if [ "$n" -ge 200 ]; then echo "[q5a] giving up" >&2; exit 1; fi
  done
  echo "[q5a] tunnel up $(date +%H:%M:%S)" >&2
}
run_watched() {
  local tag="$1" stall="$2" cap="$3"; shift 3
  local try
  for try in 1 2 3; do
    wait_tunnel
    echo "[q5a] $tag try $try $(date +%H:%M:%S)" >&2
    "$@" > "measurements/${tag}.log" 2> "measurements/${tag}.err" &
    local pid=$!
    local prev=0 now elapsed=0 wall=0
    while kill -0 "$pid" 2>/dev/null; do
      sleep 60
      elapsed=$((elapsed + 60)); wall=$((wall + 60))
      now=$(awk '{print $14+$15}' /proc/$pid/stat 2>/dev/null || echo "")
      [ -z "$now" ] && break
      if { [ $((now - prev)) -lt 200 ] && [ "$elapsed" -ge "$stall" ]; } \
         || [ "$wall" -ge "$cap" ]; then
        echo "[q5a] $tag STALLED/capped — killing $pid" >&2
        kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
        break
      fi
      if [ $((now - prev)) -ge 200 ]; then elapsed=0; fi
      prev=$now
    done
    wait "$pid" 2>/dev/null && { echo "[q5a] $tag ok" >&2; return 0; }
    echo "[q5a] $tag retrying" >&2
  done
  echo "[q5a] $tag FAILED" >&2
  return 1
}
run_watched q5a_b32_t1000_derived 2400 4500 \
  python bench.py --batch 32 --tokens 1000 --iters 3
run_watched q5a_b32_t1000_off 2400 4500 \
  env CHATTERBOX_PHASED_CACHE=0 python bench.py --batch 32 --tokens 1000 --iters 3
run_watched q5a_b16_t1000_derived 2400 4200 \
  python bench.py --batch 16 --tokens 1000 --iters 4
run_watched q5a_b16_t1000_off 2400 4200 \
  env CHATTERBOX_PHASED_CACHE=0 python bench.py --batch 16 --tokens 1000 --iters 4
run_watched q5a_b16_t600_derived 2400 4200 \
  python bench.py --batch 16 --tokens 600 --iters 4
run_watched q5a_b16_t600_off 2400 4200 \
  env CHATTERBOX_PHASED_CACHE=0 python bench.py --batch 16 --tokens 600 --iters 4
echo "[q5a] done $(date +%H:%M:%S)" >&2
