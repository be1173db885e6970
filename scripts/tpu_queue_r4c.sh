#!/usr/bin/env bash
# Round-4 TPU queue, consolidated (parts 1+2 + CFM-cache cells), with LONG
# tunnel-recovery patience — the 2026-08-17 outage exceeded 2 h.
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
    n=$((n+1)); echo "[q4c] tunnel down, retry $n $(date +%H:%M:%S)" >&2
    sleep 150
    if [ "$n" -ge 200 ]; then echo "[q4c] giving up" >&2; exit 1; fi
  done
  echo "[q4c] tunnel up $(date +%H:%M:%S)" >&2
}

run_bench() {  # run_bench <tag> <args...>
  local tag="$1"; shift
  wait_tunnel
  echo "[q4c] $tag $(date +%H:%M:%S)" >&2
  local line
  line=$(timeout 2400 python bench.py "$@" 2>"/tmp/q4c_${tag}.log")
  echo "{\"tag\": \"$tag\", \"result\": ${line:-null}}" | tee -a /tmp/q4c_results.jsonl
}

# ---- 1) headline + TTFA with the new defaults (int8 on) — the round's
# most important numbers; run FIRST in case the tunnel flakes again
run_bench headline_int8_default --iters 5
run_bench ttfa_int8_default --stream --iters 5

# ---- 2) batch-32 S3Gen matrix: sub-batch x int8-s3gen x cfm-cache
(export CHATTERBOX_S3GEN_SUB_BATCH=16; run_bench s3_sub16 --batch 32 --iters 3)
(export CHATTERBOX_S3GEN_SUB_BATCH=32; run_bench s3_sub32 --batch 32 --iters 3)
(export CHATTERBOX_S3GEN_SUB_BATCH=16; run_bench s3_sub16_int8s3gen --batch 32 --iters 3 --int8-s3gen)
(export CHATTERBOX_S3GEN_SUB_BATCH=16 CHATTERBOX_CFM_CACHE=2; run_bench s3_sub16_cfmcache --batch 32 --iters 3)
(export CHATTERBOX_S3GEN_SUB_BATCH=16 CHATTERBOX_CFM_CACHE=2; run_bench s3_sub16_both --batch 32 --iters 3 --int8-s3gen)

# ---- 3) int8 KV cache A/B at KV-bound batch sizes
run_bench kv8 --batch 8 --iters 3 --int8-kv
run_bench kv16 --batch 16 --iters 3 --int8-kv
run_bench kv16_w8 --batch 16 --iters 3 --int8-kv --int8

# ---- 4) int8 promotion gate at full size
wait_tunnel
echo "[q4c] int8 gate $(date +%H:%M:%S)" >&2
timeout 2400 python scripts/int8_quality_gate.py --utterances 4 --tokens 160 \
  2>/tmp/q4c_gate.log | tee /tmp/int8_gate_full.json

# ---- 5) decode-step attribution + device profile (VERDICT #1)
wait_tunnel
echo "[q4c] decode attribution $(date +%H:%M:%S)" >&2
timeout 3000 python scripts/decode_step_attribution.py \
  > /tmp/decode_attr.json 2>/tmp/decode_attr.log
echo "[q4c] attribution rc=$?" >&2
wait_tunnel
echo "[q4c] profile_decode $(date +%H:%M:%S)" >&2
timeout 2400 python scripts/profile_decode.py --steps 192 \
  > /tmp/profile_decode_bf16.txt 2>/tmp/profile_decode_bf16.log
echo "[q4c] profile rc=$?" >&2

# ---- 6) B=64 product probe (+ int8 KV stage on OOM)
wait_tunnel
echo "[q4c] b64 probe $(date +%H:%M:%S)" >&2
REPRO_B64=1 timeout 2400 python scripts/b64_product_probe.py \
  > /tmp/b64_probe.jsonl 2>/tmp/b64_probe.log
rc=$?
echo "[q4c] b64 rc=$rc" >&2
if [ "$rc" -ne 0 ]; then
  wait_tunnel
  echo "[q4c] b64 probe with int8 KV $(date +%H:%M:%S)" >&2
  REPRO_B64=1 PROBE_INT8_KV=1 timeout 2400 python scripts/b64_product_probe.py \
    >> /tmp/b64_probe.jsonl 2>>/tmp/b64_probe.log
  echo "[q4c] b64 int8kv rc=$?" >&2
fi

# ---- 7) compile-cache key repro + streaming geometry study
wait_tunnel
timeout 2400 python scripts/repro_cache_key_instability.py --runs 3 --vary \
  > /tmp/cache_repro.json 2>/tmp/cache_repro.log
echo "[q4c] cache repro rc=$?" >&2
wait_tunnel
timeout 5000 python scripts/stream_geometry_sensitivity.py \
  > /tmp/geometry_study.json 2>/tmp/geometry_study.log
echo "[q4c] geometry rc=$?" >&2

echo "[q4c] done $(date +%H:%M:%S)" >&2
