#!/usr/bin/env bash
# Round-4 queue E: validate the row-major cache layout pin
# (llama.pin_cache_row_major) + the int8-KV-default batched configs.
set -u
cd "$(dirname "$0")/.."
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
    n=$((n+1)); echo "[q4e] tunnel down, retry $n $(date +%H:%M:%S)" >&2
    sleep 150
    if [ "$n" -ge 200 ]; then echo "[q4e] giving up" >&2; exit 1; fi
  done
  echo "[q4e] tunnel up $(date +%H:%M:%S)" >&2
}
run_bench() {
  local tag="$1"; shift
  wait_tunnel
  echo "[q4e] $tag $(date +%H:%M:%S)" >&2
  local line
  line=$(timeout 2400 python bench.py "$@" 2>"/tmp/q4e_${tag}.log")
  echo "{\"tag\": \"$tag\", \"result\": ${line:-null}}" | tee -a /tmp/q4e_results.jsonl
}

# 1) device profile of the PINNED decode path (bf16, B=2): the transposes
# (copy.615/616) and scattered stacked-DUS writes must be gone
wait_tunnel
echo "[q4e] profile pinned $(date +%H:%M:%S)" >&2
timeout 2400 python scripts/profile_decode.py --steps 192 \
  --trace-dir /tmp/jax_trace_decode_pinned \
  > /tmp/profile_decode_pinned.txt 2>/tmp/profile_decode_pinned.log
echo "[q4e] profile rc=$?" >&2
python scripts/analyze_decode_trace.py --trace-dir /tmp/jax_trace_decode_pinned \
  --steps 192 > /tmp/analyze_pinned.txt 2>&1

# 2) headline + defer A/B (both with the pin; isolates defer's own value)
run_bench headline_pinned --iters 5
(export CHATTERBOX_DEFER_KV=0; run_bench headline_pinned_eager --iters 3)

# 3) batched defaults (int8 KV now default-on; batch 32 un-sub-batched)
run_bench b16_default --batch 16 --iters 3
run_bench b32_default --batch 32 --iters 3

echo "[q4e] done $(date +%H:%M:%S)" >&2
