#!/usr/bin/env bash
# Round-4 queue S: phased cache growth A/B (CHATTERBOX_PHASED_CACHE=K).
#
# The batched XLA decode reads the whole static cache capacity every
# step; average live prefix on a 250-token request is ~68% of cap, and
# batched decode is KV-bandwidth bound. K phases decode against
# successively larger caches (migrated by one zero-pad). Expected from
# the HBM arithmetic: ~-16% KV traffic at K=2, ~-24% at K=4 — worth
# ~-10%/-15% of the batched step if the per-phase program switch and
# migration cost stay negligible. Baseline cells ran in q4q (b16 4.72 /
# b32 6.86 ms/step); a same-session baseline is re-run here anyway.
set -u
cd "$(dirname "$0")/.."
mkdir -p measurements
export PYTHONPATH="/root/repo:/root/.axon_site"
OUT=measurements/q4s_results.jsonl

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
x = (jnp.ones((128,128)) @ jnp.ones((128,128))).block_until_ready()
print('tunnel ok')" >/dev/null 2>&1
}
wait_tunnel() {
  local n=0
  until probe; do
    n=$((n+1)); echo "[q4s] tunnel down, retry $n $(date +%H:%M:%S)" >&2
    sleep 150
    if [ "$n" -ge 200 ]; then echo "[q4s] giving up" >&2; exit 1; fi
  done
  echo "[q4s] tunnel up $(date +%H:%M:%S)" >&2
}
run_bench() {
  local tag="$1"; shift
  wait_tunnel
  echo "[q4s] $tag $(date +%H:%M:%S)" >&2
  local line
  line=$(timeout 3000 python bench.py "$@" 2>"measurements/q4s_${tag}.log")
  echo "{\"tag\": \"$tag\", \"result\": ${line:-null}}" | tee -a "$OUT"
}

run_bench b16_base --batch 16 --iters 3
(export CHATTERBOX_PHASED_CACHE=2; run_bench b16_ph2 --batch 16 --iters 3)
(export CHATTERBOX_PHASED_CACHE=4; run_bench b16_ph4 --batch 16 --iters 3)
(export CHATTERBOX_PHASED_CACHE=2; run_bench b32_ph2 --batch 32 --iters 3)

echo "[q4s] done $(date +%H:%M:%S)" >&2
