#!/usr/bin/env bash
# Round-4 queue AH: derived phased default at the biggest lock-step shape
# (batch 32 / 64 CFG rows, 1000-token cap). Compare q4ag b16 cells.
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
    n=$((n+1)); echo "[q4ah] tunnel down, retry $n $(date +%H:%M:%S)" >&2
    sleep 150
    if [ "$n" -ge 200 ]; then echo "[q4ah] giving up" >&2; exit 1; fi
  done
  echo "[q4ah] tunnel up $(date +%H:%M:%S)" >&2
}
run_watched() {
  local tag="$1" stall="$2" cap="$3"; shift 3
  local try
  for try in 1 2 3; do
    wait_tunnel
    echo "[q4ah] $tag try $try $(date +%H:%M:%S)" >&2
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
        echo "[q4ah] $tag STALLED/capped — killing $pid" >&2
        kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
        break
      fi
      if [ $((now - prev)) -ge 200 ]; then elapsed=0; fi
      prev=$now
    done
    wait "$pid" 2>/dev/null && { echo "[q4ah] $tag ok" >&2; return 0; }
    echo "[q4ah] $tag retrying" >&2
  done
  echo "[q4ah] $tag FAILED" >&2
  return 1
}
# Round-4 queue AH: the DERIVED phased default (commit c69a3d0) at the
# biggest lock-step shape — batch 32 (64 CFG rows), 1000-token cap: the
# un-sub-batched int8-KV decode now runs 4 successively larger cache
# programs; confirm no HBM regression and record the long-cap b32 cell.
run_watched q4ah_b32_t1000_derived 2400 4500 \
  python bench.py --batch 32 --tokens 1000 --iters 3
echo "[q4ah] done $(date +%H:%M:%S)" >&2
