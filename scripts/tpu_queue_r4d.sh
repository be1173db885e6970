#!/usr/bin/env bash
# Round-4 follow-up queue (after tpu_queue_r4c.sh):
#  - headline + TTFA re-run in a QUIET container (the r4c cells ran
#    concurrently with the CPU test suite on the throttled host and came
#    out 15-25% high: RTF 0.102 / TTFA 0.148 vs round-3 0.064-0.075 /
#    0.116-0.127);
#  - the two CFM-cache cells that crashed on the bf16 lax.cond dtype
#    mismatch (fixed in flow_decoder.forward_mid_cached);
#  - the int8-KV A/B base the r4c matrix lacked (batch 16 with int8
#    weights but WITHOUT int8 KV — r3's 6.18 ms/step base was bf16 weights);
#  - batch-32 int8-KV (r4c only measured KV at 8/16).
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
    n=$((n+1)); echo "[q4d] tunnel down, retry $n $(date +%H:%M:%S)" >&2
    sleep 150
    if [ "$n" -ge 200 ]; then echo "[q4d] giving up" >&2; exit 1; fi
  done
  echo "[q4d] tunnel up $(date +%H:%M:%S)" >&2
}

run_bench() {  # run_bench <tag> <args...>
  local tag="$1"; shift
  wait_tunnel
  echo "[q4d] $tag $(date +%H:%M:%S)" >&2
  local line
  line=$(timeout 2400 python bench.py "$@" 2>"/tmp/q4d_${tag}.log")
  echo "{\"tag\": \"$tag\", \"result\": ${line:-null}}" | tee -a /tmp/q4d_results.jsonl
}

run_bench headline_int8_default --iters 5
run_bench ttfa_int8_default --stream --iters 5

# int8-KV A/B base + KV at the remaining batch sizes + native-dot mode 2
(export CHATTERBOX_INT8_KV=0; run_bench b16_no_kv --batch 16 --iters 3)
run_bench kv32 --batch 32 --iters 3 --int8-kv
(export CHATTERBOX_INT8_KV=2; run_bench kv16_mode2 --batch 16 --iters 3)

# full-size int8 KV quality gate (mode 1: the perf-winning config)
wait_tunnel
echo "[q4d] kv gate $(date +%H:%M:%S)" >&2
timeout 2400 python scripts/int8_quality_gate.py --utterances 3 --tokens 160 \
  --kv 1 2>/tmp/q4d_kvgate.log | tee /tmp/kv_gate_full.json

# CFM-cache cells (bf16 dtype fix landed)
(export CHATTERBOX_S3GEN_SUB_BATCH=16 CHATTERBOX_CFM_CACHE=2; run_bench s3_sub16_cfmcache --batch 32 --iters 3)
(export CHATTERBOX_S3GEN_SUB_BATCH=16 CHATTERBOX_CFM_CACHE=2; run_bench s3_sub16_both --batch 32 --iters 3 --int8-s3gen)

# decode attribution (fixed: params as jit arg, not baked constants) +
# a fresh device profile of the NEW deferred-insert decode path
wait_tunnel
echo "[q4d] decode attribution $(date +%H:%M:%S)" >&2
timeout 3000 python scripts/decode_step_attribution.py \
  > /tmp/decode_attr.json 2>/tmp/decode_attr.log
echo "[q4d] attribution rc=$?" >&2
wait_tunnel
echo "[q4d] profile_decode (deferred path) $(date +%H:%M:%S)" >&2
timeout 2400 python scripts/profile_decode.py --steps 192 \
  --trace-dir /tmp/jax_trace_decode_defer \
  > /tmp/profile_decode_defer.txt 2>/tmp/profile_decode_defer.log
echo "[q4d] profile rc=$?" >&2

# streaming geometry study (r4c run crashed on a mid-edit import race)
wait_tunnel
timeout 5000 python scripts/stream_geometry_sensitivity.py \
  > /tmp/geometry_study.json 2>/tmp/geometry_study.log
echo "[q4d] geometry rc=$?" >&2

echo "[q4d] done $(date +%H:%M:%S)" >&2
