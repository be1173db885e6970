#!/usr/bin/env bash
# Round-4 queue AE: CFG-interval truncation (cfm.solve_euler cfg_steps) —
# quality gate + speed cells at full size.
#
# The batched S3Gen pass is the CFM solve (83% at the promoted K=2 stride,
# PERF_NOTES stage attribution) and the estimator runs a fused cond/uncond
# CFG pair every Euler step. cfg_steps=k keeps the pair only for the first
# k of 10 steps and integrates cond-only rows after — halving the estimator
# work of the truncated steps. Cells:
#   1. quality: scripts/cfm_cache_gate.py --cfg-steps 5,6,8 --cell-k 2
#      (composed with the promoted stride, bounds vs the exact solver)
#   2. speed:  scripts/profile_s3gen.py at the product sub-batch
#      (rows 16, 250 tokens) for K=2 baseline vs K=2+cfg6 vs K=2+cfg5
# Promotion needs BOTH: pass bounds AND a real batched-pass win.
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
    n=$((n+1)); echo "[q4ae] tunnel down, retry $n $(date +%H:%M:%S)" >&2
    sleep 150
    if [ "$n" -ge 200 ]; then echo "[q4ae] giving up" >&2; exit 1; fi
  done
  echo "[q4ae] tunnel up $(date +%H:%M:%S)" >&2
}
run_watched() {
  local tag="$1" stall="$2" cap="$3"; shift 3
  local try
  for try in 1 2 3; do
    wait_tunnel
    echo "[q4ae] $tag try $try $(date +%H:%M:%S)" >&2
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
        echo "[q4ae] $tag STALLED/capped — killing $pid" >&2
        kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
        break
      fi
      if [ $((now - prev)) -ge 200 ]; then elapsed=0; fi
      prev=$now
    done
    wait "$pid" 2>/dev/null && { echo "[q4ae] $tag ok" >&2; return 0; }
    echo "[q4ae] $tag retrying" >&2
  done
  echo "[q4ae] $tag FAILED" >&2
  return 1
}
# stall window 2400 s: the gate's transfer + per-cell remote compiles are
# low-CPU for tens of minutes (the 900 s window false-killed try 1)
run_watched q4ae_quality_gate 2400 5400 \
  python scripts/cfm_cache_gate.py --rows 4 --tokens 250 --ks 2 \
    --cfg-steps 5,6,8 --cell-k 2
run_watched q4ae_speed_k2 2400 3600 \
  python scripts/profile_s3gen.py --rows 16 --tokens 250 --iters 3 \
    --cfm-cache 2
run_watched q4ae_speed_k2_cfg6 2400 3600 \
  python scripts/profile_s3gen.py --rows 16 --tokens 250 --iters 3 \
    --cfm-cache 2 --cfg-steps 6
run_watched q4ae_speed_k2_cfg5 2400 3600 \
  python scripts/profile_s3gen.py --rows 16 --tokens 250 --iters 3 \
    --cfm-cache 2 --cfg-steps 5
echo "[q4ae] done $(date +%H:%M:%S)" >&2
