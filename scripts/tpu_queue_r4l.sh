#!/usr/bin/env bash
# Round-4 queue L: eager + stacked-cache kernel entry A/B
# (CHATTERBOX_FLASH_STACKED=1) at the int8 headline shape.
#
# The r4 eager trace attributes ~290 us/step at B=2 to the per-layer
# ck[i]/cv[i] slice copies feeding the flash kernel. The stacked entry
# removes the slices; the open question is whether XLA inserts defensive
# full-cache copies around a custom call whose operand is DUS-mutated in
# the same while body (what sank the deferred variant, q4j traces). A
# win shows as ~-0.25 ms/step; a loss shows as +several-hundred-us of
# copies and kills the experiment.
set -u
cd "$(dirname "$0")/.."
mkdir -p measurements
export PYTHONPATH="/root/repo:/root/.axon_site"
OUT=measurements/q4l_results.jsonl

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
x = (jnp.ones((128,128)) @ jnp.ones((128,128))).block_until_ready()
print('tunnel ok')" >/dev/null 2>&1
}
wait_tunnel() {
  local n=0
  until probe; do
    n=$((n+1)); echo "[q4l] tunnel down, retry $n $(date +%H:%M:%S)" >&2
    sleep 150
    if [ "$n" -ge 200 ]; then echo "[q4l] giving up" >&2; exit 1; fi
  done
  echo "[q4l] tunnel up $(date +%H:%M:%S)" >&2
}
run_bench() {
  local tag="$1"; shift
  wait_tunnel
  echo "[q4l] $tag $(date +%H:%M:%S)" >&2
  local line
  line=$(timeout 2400 python bench.py "$@" 2>"measurements/q4l_${tag}.log")
  echo "{\"tag\": \"$tag\", \"result\": ${line:-null}}" | tee -a "$OUT"
}

run_bench int8_slices --iters 3
(export CHATTERBOX_FLASH_STACKED=1; run_bench int8_stacked --iters 3)

echo "[q4l] done $(date +%H:%M:%S)" >&2
