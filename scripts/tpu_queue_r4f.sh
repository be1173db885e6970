#!/usr/bin/env bash
# Round-4 queue F: arbitrate the (now actually-engaged) KV cache layout pin
# and diagnose the r4e batched slowdown.
#
# Context: the r4e queue's "pinned" cells are POISONED — the
# Format(Layout(...)) fix landed in the working tree MID-QUEUE, so
# headline_pinned ran the broken no-op pin while b16/b32_default ran the
# fixed pin. b16 came out 10.28 ms/step vs 4.7-5.7 in r4c/r4d, so the
# prime suspect is the pin itself (a forced row-major layout can insert
# per-step transposes in the batched int8-KV path). This queue A/Bs the
# pin via CHATTERBOX_PIN_KV at B=1 and batch 16, separates defer's
# contribution, and runs the full-size CFM-cache gate.
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
    n=$((n+1)); echo "[q4f] tunnel down, retry $n $(date +%H:%M:%S)" >&2
    sleep 150
    if [ "$n" -ge 200 ]; then echo "[q4f] giving up" >&2; exit 1; fi
  done
  echo "[q4f] tunnel up $(date +%H:%M:%S)" >&2
}
run_bench() {
  local tag="$1"; shift
  wait_tunnel
  echo "[q4f] $tag $(date +%H:%M:%S)" >&2
  local line
  line=$(timeout 2400 python bench.py "$@" 2>"/tmp/q4f_${tag}.log")
  echo "{\"tag\": \"$tag\", \"result\": ${line:-null}}" | tee -a /tmp/q4f_results.jsonl
}

# 1) device profile of the FIXED pin at B=2: do the stacked-DUS pair
# (~400 us) and the flash reformat copies (copy.615/616, ~275 us) vanish?
wait_tunnel
echo "[q4f] profile pin-fixed $(date +%H:%M:%S)" >&2
timeout 2400 python scripts/profile_decode.py --steps 192 \
  --trace-dir /tmp/jax_trace_decode_pinfixed \
  > /tmp/profile_decode_pinfixed.txt 2>/tmp/profile_decode_pinfixed.log
echo "[q4f] profile rc=$?" >&2
python scripts/analyze_decode_trace.py --trace-dir /tmp/jax_trace_decode_pinfixed \
  --steps 192 > /tmp/analyze_pinfixed.txt 2>&1

# 2) headline pin A/B (defer + int8 defaults on both sides)
run_bench headline_pin --iters 3
(export CHATTERBOX_PIN_KV=0; run_bench headline_nopin --iters 3)

# 3) batch-16 disentangle: pin x defer (int8 KV mode 1 everywhere)
run_bench b16_pin_defer --batch 16 --iters 3
(export CHATTERBOX_PIN_KV=0; run_bench b16_nopin_defer --batch 16 --iters 3)
(export CHATTERBOX_PIN_KV=0 CHATTERBOX_DEFER_KV=0; run_bench b16_nopin_eager --batch 16 --iters 3)

# 4) full-size CFM solver-cache gate (promotion evidence for K=2/3)
wait_tunnel
echo "[q4f] cfm gate $(date +%H:%M:%S)" >&2
timeout 2400 python scripts/cfm_cache_gate.py --rows 4 --tokens 250 --ks 2,3 \
  > /tmp/q4f_cfm_gate.json 2>/tmp/q4f_cfm_gate.log
echo "[q4f] cfm gate rc=$?" >&2
cat /tmp/q4f_cfm_gate.json >> /tmp/q4f_results.jsonl

# 5) batch-32 candidate default config: no pin + CFM cache K=2
(export CHATTERBOX_PIN_KV=0 CHATTERBOX_CFM_CACHE=2; run_bench b32_nopin_cfm2 --batch 32 --iters 3)

echo "[q4f] done $(date +%H:%M:%S)" >&2
