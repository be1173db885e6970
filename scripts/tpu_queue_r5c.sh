#!/usr/bin/env bash
# Round-5 queue C: the KV-bytes decode fence (t3.KV_FENCE_BYTES).
#   1. b32 x 1000 under SHIPPED DEFAULTS — the 6/6-crash shape (q5a,
#      phased AND unphased) must now complete green: the capacity-aware
#      fence sub-batches 32 utts into 2 x 16 (2.23 GB KV each) instead of
#      one 64-row 4.45 GB decode.
#   2/3. Bisect the 2.6-4.45 GB gap with CHATTERBOX_MAX_DECODE_UTT=32
#      forcing un-sub-batched decodes: b32 x 600 (64 rows x cap ~788,
#      3.10 GB) and b24 x 1000 (48 rows x cap 1132, 3.34 GB). A green cell
#      raises KV_FENCE_BYTES (env CHATTERBOX_KV_FENCE_BYTES, then code)
#      to just above it; a crash tightens the interval. Run LAST — a
#      worker crash can wedge the tunnel for the next cell.
set -u
cd "$(dirname "$0")/.."
mkdir -p measurements
export PYTHONPATH="/root/repo:/root/.axon_site"
QTAG=q5c
source "$(dirname "$0")/tpu_queue_lib.sh"
run_watched q5c_b32_t1000_fenced 2400 5400 3 \
  python bench.py --batch 32 --tokens 1000 --iters 3
# bisect cells: 2 tries each (a crash here is DATA, not a flake to chase)
run_watched q5c_b32_t600_rows64 2400 4200 2 \
  env CHATTERBOX_MAX_DECODE_UTT=32 python bench.py --batch 32 --tokens 600 --iters 3
run_watched q5c_b24_t1000_rows48 2400 4200 2 \
  env CHATTERBOX_MAX_DECODE_UTT=32 python bench.py --batch 24 --tokens 1000 --iters 3
echo "[q5c] done $(date +%H:%M:%S)" >&2
