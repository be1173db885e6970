#!/usr/bin/env bash
# Round-4 queue AD: quiet-machine re-validation of the headline bench cell.
# The 16:07 run (RTF 0.0858) executed concurrently with a full CPU pytest
# sweep on the throttled host — PERF_NOTES records 15-25% inflation under
# exactly that contention. This queue re-runs the default full-size bench
# on an idle machine to confirm the shipped defaults still land at the
# round-4 headline (RTF ~0.065, t3 ~1.95 ms/step, s3gen ~0.15 s).
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
    n=$((n+1)); echo "[q4ad] tunnel down, retry $n $(date +%H:%M:%S)" >&2
    sleep 150
    if [ "$n" -ge 200 ]; then echo "[q4ad] giving up" >&2; exit 1; fi
  done
  echo "[q4ad] tunnel up $(date +%H:%M:%S)" >&2
}
run_watched() {
  local tag="$1" stall="$2" cap="$3"; shift 3
  local try
  for try in 1 2 3; do
    wait_tunnel
    echo "[q4ad] $tag try $try $(date +%H:%M:%S)" >&2
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
        echo "[q4ad] $tag STALLED/capped — killing $pid" >&2
        kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
        break
      fi
      if [ $((now - prev)) -ge 200 ]; then elapsed=0; fi
      prev=$now
    done
    wait "$pid" 2>/dev/null && { echo "[q4ad] $tag ok" >&2; return 0; }
    echo "[q4ad] $tag retrying" >&2
  done
  echo "[q4ad] $tag FAILED" >&2
  return 1
}
run_watched q4ad_bench 900 3600 python bench.py
echo "[q4ad] done $(date +%H:%M:%S)" >&2
