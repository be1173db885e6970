#!/usr/bin/env bash
# Round-4 TPU queue, part 2: decode profiling, B=64 probe, cache-key repro,
# streaming-geometry sensitivity. Same tunnel-recovery waits as part 1.
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
    n=$((n+1)); echo "[q2] tunnel down, retry $n $(date +%H:%M:%S)" >&2
    sleep 120
    if [ "$n" -ge 40 ]; then echo "[q2] giving up" >&2; exit 1; fi
  done
  echo "[q2] tunnel up $(date +%H:%M:%S)" >&2
}

# 1) decode-step device profile at B=2 (VERDICT #1)
wait_tunnel
echo "[q2] profile_decode $(date +%H:%M:%S)" >&2
timeout 2400 python scripts/profile_decode.py --steps 192 \
  > /tmp/profile_decode_bf16.txt 2>/tmp/profile_decode_bf16.log
echo "[q2] profile_decode rc=$?" >&2

# 2) B=64 product probe (VERDICT #6)
wait_tunnel
echo "[q2] b64 probe $(date +%H:%M:%S)" >&2
REPRO_B64=1 timeout 2400 python scripts/b64_product_probe.py \
  > /tmp/b64_probe.jsonl 2>/tmp/b64_probe.log
echo "[q2] b64 probe rc=$?" >&2

# 3) compile-cache key repro on the tunnel (weak #6)
wait_tunnel
echo "[q2] cache repro $(date +%H:%M:%S)" >&2
timeout 2400 python scripts/repro_cache_key_instability.py --runs 3 --vary \
  > /tmp/cache_repro.json 2>/tmp/cache_repro.log
echo "[q2] cache repro rc=$?" >&2

# 3b) int8 KV cache A/B at the batch sizes where decode is KV-bandwidth
# bound (baselines: batch 8 = 0.984 s t3, batch 16 = 1.545 s from the
# round-4 flash A/B; expected ~-40% at 16 from the HBM arithmetic)
for B in 8 16; do
  for FLAGS in "--int8-kv" "--int8-kv --int8"; do
    wait_tunnel
    echo "[q2] kv A/B batch=$B flags='$FLAGS' $(date +%H:%M:%S)" >&2
    LINE=$(timeout 2400 python bench.py --batch $B --iters 3 $FLAGS \
             2>/tmp/kv_stderr_${B}.log)
    echo "{\"batch\": $B, \"flags\": \"$FLAGS\", \"result\": ${LINE:-null}}" \
      | tee -a /tmp/kv_ab.jsonl
  done
done

# 4) streaming geometry sensitivity at full size (weak #7)
wait_tunnel
echo "[q2] geometry study $(date +%H:%M:%S)" >&2
timeout 5000 python scripts/stream_geometry_sensitivity.py \
  > /tmp/geometry_study.json 2>/tmp/geometry_study.log
echo "[q2] geometry rc=$?" >&2

echo "[q2] done $(date +%H:%M:%S)" >&2
