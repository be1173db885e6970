#!/usr/bin/env bash
# Round-4 queue I: re-run of the q4h cells whose results were lost to a
# container restart (bench_out/ is gitignored and ephemeral). Identical
# measurements, but results persist to measurements/ (tracked) so the
# numbers survive restarts and land in git with the PERF_NOTES rows.
#
#   1) bf16 headline A/B over CHATTERBOX_DEFER_KV — the deferred stacked
#      KV insert landed (commit 0a1f519) to attack the trace-attributed
#      434 us of per-layer inserts + 290 us of slab copies, but the bf16
#      ms/step after it was never recorded (VERDICT r4 item 1's "<= 2.0
#      bf16" criterion; the r4d cells all ran int8 weights).
#   2) int8-s3gen at B=1 (promotion prerequisite: the full-size mel gate
#      passes — mel cos 0.99997 — but the headline cost was never
#      measured; a single-utterance regression would block default-on).
#   3) Streaming window geometry sensitivity (VERDICT r3 weak #7): sweep
#      C (flow ctx tokens) / M (vocoder ctx mel) around the 6/8 defaults,
#      report rel-L2 of the streamed waveform vs the widest geometry.
set -u
cd "$(dirname "$0")/.."
mkdir -p measurements
export PYTHONPATH="/root/repo:/root/.axon_site"
OUT=measurements/q4i_results.jsonl

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
x = (jnp.ones((128,128)) @ jnp.ones((128,128))).block_until_ready()
print('tunnel ok')" >/dev/null 2>&1
}
wait_tunnel() {
  local n=0
  until probe; do
    n=$((n+1)); echo "[q4i] tunnel down, retry $n $(date +%H:%M:%S)" >&2
    sleep 150
    if [ "$n" -ge 200 ]; then echo "[q4i] giving up" >&2; exit 1; fi
  done
  echo "[q4i] tunnel up $(date +%H:%M:%S)" >&2
}
run_bench() {
  local tag="$1"; shift
  wait_tunnel
  echo "[q4i] $tag $(date +%H:%M:%S)" >&2
  local line
  line=$(timeout 2400 python bench.py "$@" 2>"measurements/q4i_${tag}.log")
  echo "{\"tag\": \"$tag\", \"result\": ${line:-null}}" | tee -a "$OUT"
}

# ---- 1) bf16 defer A/B at the single-utterance headline shape ------------
# (with the flash-only defer default landed, --no-int8 alone IS the defer
# side at B=2; DEFER_KV=0 forces insert-first under flash)
run_bench bf16_defer --no-int8 --iters 3
(export CHATTERBOX_DEFER_KV=0; run_bench bf16_eager --no-int8 --iters 3)

# ---- 2) int8-s3gen at B=1 -------------------------------------------------
run_bench headline_int8s3gen --int8-s3gen --iters 3

# ---- 3) streaming geometry sensitivity (full size, subprocess per cell) ---
wait_tunnel
echo "[q4i] stream geometry $(date +%H:%M:%S)" >&2
timeout 5400 python scripts/stream_geometry_sensitivity.py \
  > measurements/q4i_stream_geometry.json 2>measurements/q4i_stream_geometry.log
echo "[q4i] stream geometry rc=$?" >&2
cat measurements/q4i_stream_geometry.json >> "$OUT" 2>/dev/null

echo "[q4i] done $(date +%H:%M:%S)" >&2
