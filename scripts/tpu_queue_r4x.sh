#!/usr/bin/env bash
# Round-4 queue X: continuous-engine attribution cells, with a STALL
# WATCHDOG — the axon tunnel intermittently wedges a process (futex-wait,
# frozen CPU time) while fresh probes still pass; a wedged job must be
# killed by PID and retried (CLAUDE.md TPU-jobs convention).
#
# Cells:
#   1. ablation probe (int8-KV defaults): engine_uniform vs +pos / +rng /
#      +posrng — attributes the engine's +2.3 ms/slot-step vs lock-step
#      (per-row insert+mask+positions vs per-row sampling chain).
#   2. bf16-KV probe (CHATTERBOX_INT8_KV=0): tests the int8
#      convert-into-dot fusion-break hypothesis.
set -u
cd "$(dirname "$0")/.."
mkdir -p measurements
export PYTHONPATH="/root/repo:/root/.axon_site"

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
x = (jnp.ones((128,128)) @ jnp.ones((128,128))).block_until_ready()
print('tunnel ok')" >/dev/null 2>&1
}
wait_tunnel() {
  local n=0
  until probe; do
    n=$((n+1)); echo "[q4x] tunnel down, retry $n $(date +%H:%M:%S)" >&2
    sleep 150
    if [ "$n" -ge 200 ]; then echo "[q4x] giving up" >&2; exit 1; fi
  done
  echo "[q4x] tunnel up $(date +%H:%M:%S)" >&2
}

# run_watched <tag> <stall_secs> <cmd...>: run cmd in background; kill+retry
# (up to 3 tries) if its CPU time advances < 2s over any stall_secs window.
run_watched() {
  local tag="$1" stall="$2"; shift 2
  local try
  for try in 1 2 3; do
    wait_tunnel
    echo "[q4x] $tag try $try $(date +%H:%M:%S)" >&2
    "$@" &
    local pid=$!
    local prev=0 now elapsed=0
    while kill -0 "$pid" 2>/dev/null; do
      sleep 60
      elapsed=$((elapsed + 60))
      now=$(awk '{print $14+$15}' /proc/$pid/stat 2>/dev/null || echo "")
      [ -z "$now" ] && break
      if [ $((now - prev)) -lt 200 ] && [ "$elapsed" -ge "$stall" ]; then
        echo "[q4x] $tag STALLED (cpu ${now} ticks) — killing $pid" >&2
        kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
        break
      fi
      if [ $((now - prev)) -ge 200 ]; then elapsed=0; fi
      prev=$now
    done
    wait "$pid" 2>/dev/null
    local rc=$?
    if [ "$rc" -eq 0 ]; then echo "[q4x] $tag ok" >&2; return 0; fi
    echo "[q4x] $tag rc=$rc — retrying" >&2
  done
  echo "[q4x] $tag FAILED after 3 tries" >&2
  return 1
}

run_watched ablate 600 timeout 3600 python scripts/continuous_probe.py \
  --ablate --out measurements/q4x_ablate.jsonl

(export CHATTERBOX_INT8_KV=0
 run_watched bf16kv 600 timeout 3600 python scripts/continuous_probe.py \
   --out measurements/q4x_bf16kv.jsonl)

echo "[q4x] done $(date +%H:%M:%S)" >&2
