#!/usr/bin/env bash
# Round-5 queue D: the DRIVER-DEFAULT bench invocation (`python bench.py`,
# no args) — one session, three headline cells (B=1 RTF, B=32 RTF,
# streaming TTFA p50). Validates exactly what the driver runs for
# BENCH_r05.json and records the three-cell JSON under measurements/.
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
    n=$((n+1)); echo "[q5d] tunnel down, retry $n $(date +%H:%M:%S)" >&2
    sleep 150
    if [ "$n" -ge 200 ]; then echo "[q5d] giving up" >&2; exit 1; fi
  done
  echo "[q5d] tunnel up $(date +%H:%M:%S)" >&2
}
run_watched() {
  local tag="$1" stall="$2" cap="$3" tries="$4"; shift 4
  local try
  for try in $(seq 1 "$tries"); do
    wait_tunnel
    echo "[q5d] $tag try $try $(date +%H:%M:%S)" >&2
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
        echo "[q5d] $tag STALLED/capped — killing $pid" >&2
        kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
        break
      fi
      if [ $((now - prev)) -ge 200 ]; then elapsed=0; fi
      prev=$now
    done
    wait "$pid" 2>/dev/null && { echo "[q5d] $tag ok" >&2; return 0; }
    echo "[q5d] $tag retrying" >&2
  done
  echo "[q5d] $tag FAILED" >&2
  return 1
}
run_watched q5d_bench_default 2400 5400 3 \
  python bench.py
echo "[q5d] done $(date +%H:%M:%S)" >&2
