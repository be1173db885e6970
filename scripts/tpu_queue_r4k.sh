#!/usr/bin/env bash
# Round-4 queue K: int8 defer-vs-eager A/B at the single-utterance headline.
#
# q4i settled bf16: eager insert-first 2.439 ms/step BEATS the deferred
# stacked insert 2.634 (and batch-16 XLA already chose eager, 4.79 vs
# 10.2). The only cell missing before flipping CHATTERBOX_DEFER_KV's
# default to insert-first everywhere is an int8-weights A/B in the SAME
# session (the 1.94 eager number is round-3, the 1.97 defer number is
# q4g — cross-session tunnel variance could hide the true sign).
set -u
cd "$(dirname "$0")/.."
mkdir -p measurements
export PYTHONPATH="/root/repo:/root/.axon_site"
OUT=measurements/q4k_results.jsonl

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
x = (jnp.ones((128,128)) @ jnp.ones((128,128))).block_until_ready()
print('tunnel ok')" >/dev/null 2>&1
}
wait_tunnel() {
  local n=0
  until probe; do
    n=$((n+1)); echo "[q4k] tunnel down, retry $n $(date +%H:%M:%S)" >&2
    sleep 150
    if [ "$n" -ge 200 ]; then echo "[q4k] giving up" >&2; exit 1; fi
  done
  echo "[q4k] tunnel up $(date +%H:%M:%S)" >&2
}
run_bench() {
  local tag="$1"; shift
  wait_tunnel
  echo "[q4k] $tag $(date +%H:%M:%S)" >&2
  local line
  line=$(timeout 2400 python bench.py "$@" 2>"measurements/q4k_${tag}.log")
  echo "{\"tag\": \"$tag\", \"result\": ${line:-null}}" | tee -a "$OUT"
}

# int8 weights (the default), flash path at B=2 rows: defer is the current
# default on flash; DEFER_KV=0 forces insert-first.
run_bench int8_defer --iters 3
(export CHATTERBOX_DEFER_KV=0; run_bench int8_eager --iters 3)

# Device trace of the int8 EAGER path — the configuration that ships if
# the A/B above confirms the flip (the existing traces cover bf16-eager
# pre-round-4 and the defer variants only).
wait_tunnel
echo "[q4k] profile int8 eager $(date +%H:%M:%S)" >&2
CHATTERBOX_DEFER_KV=0 timeout 2400 python scripts/profile_decode.py \
  --steps 192 --int8 --trace-dir /tmp/jax_trace_q4k_int8_eager \
  > measurements/q4k_profile_int8_eager.txt 2>&1
echo "[q4k] profile rc=$?" >&2

echo "[q4k] done $(date +%H:%M:%S)" >&2
