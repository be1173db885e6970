#!/usr/bin/env bash
# Round-5 queue B: TTFA under continuous load (VERDICT r4 item 4) — the
# composed streamed-request path (ContinuousServer submit(stream=True) ->
# WindowedSynth) at 50% and 80% Poisson load, full size, real chip.
# Run AFTER tpu_queue_r5a.sh (one tunnel, quiet machine — the contention
# rule from PERF_NOTES applies).
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
    n=$((n+1)); echo "[q5b] tunnel down, retry $n $(date +%H:%M:%S)" >&2
    sleep 150
    if [ "$n" -ge 200 ]; then echo "[q5b] giving up" >&2; exit 1; fi
  done
  echo "[q5b] tunnel up $(date +%H:%M:%S)" >&2
}
run_watched() {
  local tag="$1" stall="$2" cap="$3"; shift 3
  local try
  for try in 1 2 3; do
    wait_tunnel
    echo "[q5b] $tag try $try $(date +%H:%M:%S)" >&2
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
        echo "[q5b] $tag STALLED/capped — killing $pid" >&2
        kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
        break
      fi
      if [ $((now - prev)) -ge 200 ]; then elapsed=0; fi
      prev=$now
    done
    wait "$pid" 2>/dev/null && { echo "[q5b] $tag ok" >&2; return 0; }
    echo "[q5b] $tag retrying" >&2
  done
  echo "[q5b] $tag FAILED" >&2
  return 1
}
run_watched q5b_stream_under_load 2400 5400 \
  python scripts/stream_under_load_probe.py \
    --out measurements/q5b_stream_under_load.jsonl
echo "[q5b] done $(date +%H:%M:%S)" >&2
