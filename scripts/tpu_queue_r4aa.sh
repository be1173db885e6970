#!/usr/bin/env bash
# Round-4 queue AA: latency-under-arrivals probe (engine vs pooled worker).
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
    n=$((n+1)); echo "[q4aa] tunnel down, retry $n $(date +%H:%M:%S)" >&2
    sleep 150
    if [ "$n" -ge 200 ]; then echo "[q4aa] giving up" >&2; exit 1; fi
  done
  echo "[q4aa] tunnel up $(date +%H:%M:%S)" >&2
}
run_watched() {
  local tag="$1" stall="$2"; shift 2
  local try
  for try in 1 2 3; do
    wait_tunnel
    echo "[q4aa] $tag try $try $(date +%H:%M:%S)" >&2
    "$@" &
    local pid=$!
    local prev=0 now elapsed=0
    while kill -0 "$pid" 2>/dev/null; do
      sleep 60
      elapsed=$((elapsed + 60))
      now=$(awk '{print $14+$15}' /proc/$pid/stat 2>/dev/null || echo "")
      [ -z "$now" ] && break
      if [ $((now - prev)) -lt 200 ] && [ "$elapsed" -ge "$stall" ]; then
        echo "[q4aa] $tag STALLED — killing $pid" >&2
        kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
        break
      fi
      if [ $((now - prev)) -ge 200 ]; then elapsed=0; fi
      prev=$now
    done
    wait "$pid" 2>/dev/null && { echo "[q4aa] $tag ok" >&2; return 0; }
    echo "[q4aa] $tag retrying" >&2
  done
  echo "[q4aa] $tag FAILED" >&2
  return 1
}
run_watched latency 600 timeout 3600 python scripts/continuous_latency_probe.py \
  --out measurements/q4aa_latency.jsonl
echo "[q4aa] done $(date +%H:%M:%S)" >&2
