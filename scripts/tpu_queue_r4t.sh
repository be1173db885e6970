#!/usr/bin/env bash
# Round-4 queue T: continuous-batching engine probe (full-size T3 on v5e).
#
# Cells: lock-step vs slot-refill engine at uniform 16x250 (per-step
# overhead bound) and at 32 skewed-length requests over 16 slots (the
# utilization win). See scripts/continuous_probe.py for the design.
set -u
cd "$(dirname "$0")/.."
mkdir -p measurements
export PYTHONPATH="/root/repo:/root/.axon_site"
OUT=measurements/q4t_results.jsonl

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
x = (jnp.ones((128,128)) @ jnp.ones((128,128))).block_until_ready()
print('tunnel ok')" >/dev/null 2>&1
}
wait_tunnel() {
  local n=0
  until probe; do
    n=$((n+1)); echo "[q4t] tunnel down, retry $n $(date +%H:%M:%S)" >&2
    sleep 150
    if [ "$n" -ge 200 ]; then echo "[q4t] giving up" >&2; exit 1; fi
  done
  echo "[q4t] tunnel up $(date +%H:%M:%S)" >&2
}

wait_tunnel
echo "[q4t] continuous probe $(date +%H:%M:%S)" >&2
timeout 3600 python scripts/continuous_probe.py --out "$OUT" \
  2>measurements/q4t_probe.log
echo "[q4t] done rc=$? $(date +%H:%M:%S)" >&2
