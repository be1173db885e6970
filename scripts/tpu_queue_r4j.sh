#!/usr/bin/env bash
# Round-4 queue J: post-defer decode re-profile (runs after q4i).
#
# The pre-defer trace (PERF_NOTES round-4 decode-step attribution) named
# the B=2 residual: inserts 434 us + slab copies 290 us + attention 168 us
# on 1.96 ms/step device-busy. The deferred stacked insert + stacked-cache
# flash entry landed to remove the first two; the expected device-busy was
# ~1.24 ms/step, but the q4g product headline still reads ~1.97 ms/step
# WALL. Re-profile with the landed defaults to attribute what remains —
# in particular the wall-vs-device-busy gap (dispatch/idle inside the
# while_loop) that a faster loop body would expose.
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
    n=$((n+1)); echo "[q4j] tunnel down, retry $n $(date +%H:%M:%S)" >&2
    sleep 150
    if [ "$n" -ge 200 ]; then echo "[q4j] giving up" >&2; exit 1; fi
  done
  echo "[q4j] tunnel up $(date +%H:%M:%S)" >&2
}

wait_tunnel
echo "[q4j] profile bf16 (defer default) $(date +%H:%M:%S)" >&2
timeout 2400 python scripts/profile_decode.py --steps 192 \
  --trace-dir /tmp/jax_trace_q4j_bf16 \
  > measurements/q4j_profile_bf16_defer.txt 2>&1
echo "[q4j] bf16 rc=$?" >&2

wait_tunnel
echo "[q4j] profile int8 (defer default) $(date +%H:%M:%S)" >&2
timeout 2400 python scripts/profile_decode.py --steps 192 --int8 \
  --trace-dir /tmp/jax_trace_q4j_int8 \
  > measurements/q4j_profile_int8_defer.txt 2>&1
echo "[q4j] int8 rc=$?" >&2

echo "[q4j] done $(date +%H:%M:%S)" >&2
