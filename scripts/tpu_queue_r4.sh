#!/usr/bin/env bash
# Round-4 TPU work queue with tunnel-recovery waits. The axon tunnel
# intermittently wedges (jax.devices() hangs); probe before each heavy job
# and back off until it answers.
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
    n=$((n+1))
    echo "[queue] tunnel down, retry $n $(date +%H:%M:%S)" >&2
    sleep 120
    if [ "$n" -ge 40 ]; then echo "[queue] giving up" >&2; exit 1; fi
  done
  echo "[queue] tunnel up $(date +%H:%M:%S)" >&2
}

# 1) S3Gen sub-batch x int8 sweep at batch 32 (VERDICT #4)
for SUB in 16 32 8; do
  for Q in "" "--int8-s3gen"; do
    wait_tunnel
    echo "[queue] s3gen sub=$SUB q='$Q' $(date +%H:%M:%S)" >&2
    LINE=$(CHATTERBOX_S3GEN_SUB_BATCH=$SUB timeout 2400 python bench.py \
             --batch 32 --iters 3 $Q 2>/tmp/s3_stderr_${SUB}_${Q:-bf16}.log)
    echo "{\"sub\": $SUB, \"q\": \"${Q}\", \"result\": ${LINE:-null}}" \
      | tee -a /tmp/s3gen_sweep.jsonl
  done
done

# 2) int8 promotion gate at FULL SIZE (VERDICT #2)
wait_tunnel
echo "[queue] int8 gate $(date +%H:%M:%S)" >&2
timeout 2400 python scripts/int8_quality_gate.py --utterances 4 --tokens 160 \
  2>/tmp/gate_stderr.log | tee /tmp/int8_gate_full.json

# 3) headline single-utterance bench with the new defaults (int8 on)
wait_tunnel
echo "[queue] headline bench $(date +%H:%M:%S)" >&2
timeout 2400 python bench.py --iters 5 2>/tmp/headline_stderr.log \
  | tee /tmp/headline_r4.json

# 4) streaming TTFA with new defaults
wait_tunnel
echo "[queue] ttfa bench $(date +%H:%M:%S)" >&2
timeout 2400 python bench.py --stream --iters 5 2>/tmp/ttfa_stderr.log \
  | tee /tmp/ttfa_r4.json

echo "[queue] done $(date +%H:%M:%S)" >&2
