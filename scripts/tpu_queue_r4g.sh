#!/usr/bin/env bash
# Round-4 queue G: r4f re-run (the container restarted before r4f produced
# results and /tmp was wiped), reordered DECISION-FIRST so a tunnel outage
# can't starve the default-deciding cells, plus the S3Gen stage profiler
# that landed after r4f was written.
#
# Decisions this queue feeds:
#   - CHATTERBOX_PIN_KV default (r4e's pinned batched cells were poisoned
#     by the mid-queue Format(Layout) fix; b16 showed 10.28 ms/step vs
#     4.7-5.7 in r4c/r4d -> suspect the pin inserts per-step transposes
#     in the batched int8-KV path).
#   - CHATTERBOX_DEFER_KV contribution at batch 16 (separate from pin).
#   - CFM solver-cache promotion (full-size gate, K=2/3).
#   - Where batched S3Gen time actually goes (conformer vs CFM vs HiFT).
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_out
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
    n=$((n+1)); echo "[q4g] tunnel down, retry $n $(date +%H:%M:%S)" >&2
    sleep 150
    if [ "$n" -ge 200 ]; then echo "[q4g] giving up" >&2; exit 1; fi
  done
  echo "[q4g] tunnel up $(date +%H:%M:%S)" >&2
}
run_bench() {
  local tag="$1"; shift
  wait_tunnel
  echo "[q4g] $tag $(date +%H:%M:%S)" >&2
  local line
  line=$(timeout 2400 python bench.py "$@" 2>"bench_out/q4g_${tag}.log")
  echo "{\"tag\": \"$tag\", \"result\": ${line:-null}}" | tee -a bench_out/q4g_results.jsonl
}

# ---- 1) DEFAULT-DECIDING CELLS FIRST -------------------------------------
# headline pin A/B (defer + int8 defaults on both sides)
run_bench headline_pin --iters 3
(export CHATTERBOX_PIN_KV=0; run_bench headline_nopin --iters 3)

# batch-16 disentangle: pin x defer (int8 KV mode 1 everywhere)
run_bench b16_pin_defer --batch 16 --iters 3
(export CHATTERBOX_PIN_KV=0; run_bench b16_nopin_defer --batch 16 --iters 3)
(export CHATTERBOX_PIN_KV=0 CHATTERBOX_DEFER_KV=0; run_bench b16_nopin_eager --batch 16 --iters 3)

# ---- 2) S3Gen stage attribution (rows=16 product sub-batch) --------------
s3prof() {
  local tag="$1"; shift
  wait_tunnel
  echo "[q4g] s3prof $tag $(date +%H:%M:%S)" >&2
  timeout 2400 python scripts/profile_s3gen.py --rows 16 --tokens 250 \
    --iters 3 "$@" > "bench_out/q4g_s3prof_${tag}.json" 2>"bench_out/q4g_s3prof_${tag}.log"
  echo "[q4g] s3prof $tag rc=$?" >&2
  cat "bench_out/q4g_s3prof_${tag}.json" >> bench_out/q4g_results.jsonl
}
s3prof default
s3prof cfm2 --cfm-cache 2
s3prof int8 --int8

# ---- 3) full-size CFM solver-cache gate (promotion evidence for K=2/3) ---
wait_tunnel
echo "[q4g] cfm gate $(date +%H:%M:%S)" >&2
timeout 2400 python scripts/cfm_cache_gate.py --rows 4 --tokens 250 --ks 2,3 \
  > bench_out/q4g_cfm_gate.json 2>bench_out/q4g_cfm_gate.log
echo "[q4g] cfm gate rc=$?" >&2
cat bench_out/q4g_cfm_gate.json >> bench_out/q4g_results.jsonl

# ---- 4) batch-32 candidate default config --------------------------------
(export CHATTERBOX_PIN_KV=0 CHATTERBOX_CFM_CACHE=2; run_bench b32_nopin_cfm2 --batch 32 --iters 3)

# ---- 5) device profile of the FIXED pin at B=2 (diagnostic, last) --------
# do the stacked-DUS pair (~400 us) and the flash reformat copies
# (copy.615/616, ~275 us) vanish?
wait_tunnel
echo "[q4g] profile pin-fixed $(date +%H:%M:%S)" >&2
timeout 2400 python scripts/profile_decode.py --steps 192 \
  --trace-dir /tmp/jax_trace_decode_pinfixed \
  > bench_out/profile_decode_pinfixed.txt 2>bench_out/profile_decode_pinfixed.log
echo "[q4g] profile rc=$?" >&2
python scripts/analyze_decode_trace.py --trace-dir /tmp/jax_trace_decode_pinfixed \
  --steps 192 > bench_out/analyze_pinfixed.txt 2>&1

echo "[q4g] done $(date +%H:%M:%S)" >&2
