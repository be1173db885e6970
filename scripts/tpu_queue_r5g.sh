#!/usr/bin/env bash
# Round-5 queue G: phase-LENGTH sweep at the b16 x 1000-cap cell. The q5a
# derived default (K=4, ~256-token phases) wins -27.5%/step; the only other
# measured phase-length points are 64-token phases (lose, q4s, short cap).
# Same-session A/B of K=4 (control) vs K=8 (~128-token phases, avg read
# ~8% lower) vs K=3 (~384-token phases) decides whether the ceil(cap/256)
# derivation shape is at its optimum.
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
    n=$((n+1)); echo "[q5g] tunnel down, retry $n $(date +%H:%M:%S)" >&2
    sleep 150
    if [ "$n" -ge 200 ]; then echo "[q5g] giving up" >&2; exit 1; fi
  done
  echo "[q5g] tunnel up $(date +%H:%M:%S)" >&2
}
run_watched() {
  local tag="$1" stall="$2" cap="$3" tries="$4"; shift 4
  local try
  for try in $(seq 1 "$tries"); do
    wait_tunnel
    echo "[q5g] $tag try $try $(date +%H:%M:%S)" >&2
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
        echo "[q5g] $tag STALLED/capped — killing $pid" >&2
        kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
        break
      fi
      if [ $((now - prev)) -ge 200 ]; then elapsed=0; fi
      prev=$now
    done
    wait "$pid" 2>/dev/null && { echo "[q5g] $tag ok" >&2; return 0; }
    echo "[q5g] $tag retrying" >&2
  done
  echo "[q5g] $tag FAILED" >&2
  return 1
}
run_watched q5g_b16_t1000_k4 2400 4200 3 \
  python bench.py --batch 16 --tokens 1000 --iters 4
run_watched q5g_b16_t1000_k8 2400 4200 3 \
  env CHATTERBOX_PHASED_CACHE=8 python bench.py --batch 16 --tokens 1000 --iters 4
run_watched q5g_b16_t1000_k3 2400 4200 3 \
  env CHATTERBOX_PHASED_CACHE=3 python bench.py --batch 16 --tokens 1000 --iters 4
echo "[q5g] done $(date +%H:%M:%S)" >&2
