#!/usr/bin/env bash
# Round-4 queue Q: batched-S3Gen default validation after the bench.py fix.
#
# q4p exposed that `bench.py --batch` bypassed tts.generate_batch and so
# never applied the product's CFM DeepCache default (K=2 at >= 8 live
# rows): the "b32 defaults 0.0144" row was env-forced, and today's true
# bench default measured RTF 0.0215 with s3gen 5.96 s. bench.py now
# derives the stride exactly like the product path. Cells (one session,
# quiet machine):
#   1) b32 default        — fixed bench, expect K=2 and s3gen ~3 s
#   2) b32 CFM_CACHE=0    — exact solver; also probes whether the q4p
#                           5.96 s had a second regression beyond the
#                           missing stride (q4d-scaled expectation ~4.2 s)
#   3) b16 default        — K=2 engages at sub-batch 16 now (q4d measured
#                           2.10 s with the exact solver)
#   4) b16 CFM_CACHE=0    — direct q4d comparable
set -u
cd "$(dirname "$0")/.."
mkdir -p measurements
export PYTHONPATH="/root/repo:/root/.axon_site"
OUT=measurements/q4q_results.jsonl

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
x = (jnp.ones((128,128)) @ jnp.ones((128,128))).block_until_ready()
print('tunnel ok')" >/dev/null 2>&1
}
wait_tunnel() {
  local n=0
  until probe; do
    n=$((n+1)); echo "[q4q] tunnel down, retry $n $(date +%H:%M:%S)" >&2
    sleep 150
    if [ "$n" -ge 200 ]; then echo "[q4q] giving up" >&2; exit 1; fi
  done
  echo "[q4q] tunnel up $(date +%H:%M:%S)" >&2
}
run_bench() {
  local tag="$1"; shift
  wait_tunnel
  echo "[q4q] $tag $(date +%H:%M:%S)" >&2
  local line
  line=$(timeout 3000 python bench.py "$@" 2>"measurements/q4q_${tag}.log")
  echo "{\"tag\": \"$tag\", \"result\": ${line:-null}}" | tee -a "$OUT"
}

run_bench b32_default --batch 32 --iters 3
(export CHATTERBOX_CFM_CACHE=0; run_bench b32_nocache --batch 32 --iters 3)
run_bench b16_default --batch 16 --iters 3
(export CHATTERBOX_CFM_CACHE=0; run_bench b16_nocache --batch 16 --iters 3)

echo "[q4q] done $(date +%H:%M:%S)" >&2
