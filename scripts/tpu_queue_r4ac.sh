#!/usr/bin/env bash
# Round-4 queue AC: worker-level latency probe (run_continuous vs pooled run_once
# under the same Poisson arrival schedule, full pipeline incl. vocode+storage).
# Validates the promoted default at the true product boundary.
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
    n=$((n+1)); echo "[q4ac] tunnel down, retry $n $(date +%H:%M:%S)" >&2
    sleep 150
    if [ "$n" -ge 200 ]; then echo "[q4ac] giving up" >&2; exit 1; fi
  done
  echo "[q4ac] tunnel up $(date +%H:%M:%S)" >&2
}
run_watched() {
  # Watches the PYTHON pid directly (fields 14+15 of its own /proc stat) —
  # wrapping in `timeout` would watch the wrapper's CPU time, which never
  # grows, so every run would read as a stall. Hard wall cap: $cap s.
  local tag="$1" stall="$2" cap="$3"; shift 3
  local try
  for try in 1 2 3; do
    wait_tunnel
    echo "[q4ac] $tag try $try $(date +%H:%M:%S)" >&2
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
        echo "[q4ac] $tag STALLED/capped — killing $pid" >&2
        kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
        break
      fi
      if [ $((now - prev)) -ge 200 ]; then elapsed=0; fi
      prev=$now
    done
    wait "$pid" 2>/dev/null && { echo "[q4ac] $tag ok" >&2; return 0; }
    echo "[q4ac] $tag retrying" >&2
  done
  echo "[q4ac] $tag FAILED" >&2
  return 1
}
run_watched q4ac_worker_latency 900 5400 python scripts/worker_latency_probe.py --out measurements/q4ac_worker_latency.jsonl
echo "[q4ac] done $(date +%H:%M:%S)" >&2
