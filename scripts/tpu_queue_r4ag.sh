#!/usr/bin/env bash
# Round-4 queue AF: batched bench re-measure after the vocode fetch/compute
# overlap (enqueue-all-then-fetch in tts._vocode_batch + bench) and the
# hoisted per-dispatch PRNGKey. Compare against q4q same-config cells
# (b32 DEFAULT 0.0155 / s3gen 3.584 s; b16 DEFAULT 0.0176 / s3gen 1.712 s).
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
    n=$((n+1)); echo "[q4ag] tunnel down, retry $n $(date +%H:%M:%S)" >&2
    sleep 150
    if [ "$n" -ge 200 ]; then echo "[q4ag] giving up" >&2; exit 1; fi
  done
  echo "[q4ag] tunnel up $(date +%H:%M:%S)" >&2
}
run_watched() {
  local tag="$1" stall="$2" cap="$3"; shift 3
  local try
  for try in 1 2 3; do
    wait_tunnel
    echo "[q4ag] $tag try $try $(date +%H:%M:%S)" >&2
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
        echo "[q4ag] $tag STALLED/capped — killing $pid" >&2
        kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
        break
      fi
      if [ $((now - prev)) -ge 200 ]; then elapsed=0; fi
      prev=$now
    done
    wait "$pid" 2>/dev/null && { echo "[q4ag] $tag ok" >&2; return 0; }
    echo "[q4ag] $tag retrying" >&2
  done
  echo "[q4ag] $tag FAILED" >&2
  return 1
}
# Round-4 queue AG: phased cache growth at the LONG-CAP config PERF_NOTES
# defers it to (1000-token requests: live/cap averages ~40%, so the dead
# KV reads the phases remove are ~3x the 250-token case). A/B at batch 16
# (the KV-bandwidth-bound regime), same session.
run_watched q4ag_b16_t1000_base 2400 4500 \
  python bench.py --batch 16 --tokens 1000 --iters 3
run_watched q4ag_b16_t1000_ph2 2400 4500 \
  env CHATTERBOX_PHASED_CACHE=2 python bench.py --batch 16 --tokens 1000 --iters 3
run_watched q4ag_b16_t1000_ph4 2400 4500 \
  env CHATTERBOX_PHASED_CACHE=4 python bench.py --batch 16 --tokens 1000 --iters 3
echo "[q4ag] done $(date +%H:%M:%S)" >&2
