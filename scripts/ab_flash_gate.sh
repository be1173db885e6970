#!/usr/bin/env bash
# Product-path arbitration of the flash-decode batch gate (PERF_NOTES
# round-3 study: the scan-microbench comparison at >=16 rows is
# RTT/donation-contaminated; bench.py --batch N is the arbiter).
#
# Runs the REAL end-to-end bench at each batch size with the flash decode
# kernel forced OFF (CHATTERBOX_FLASH_MAX_UTT=0 -> XLA attention) and
# forced ON (=32 -> kernel at every batch), and appends one JSON line per
# run to the output file. ~12-20 min per run through the axon tunnel.
#
# Usage: bash scripts/ab_flash_gate.sh [outfile]
set -u
OUT="${1:-/tmp/ab_flash_gate.jsonl}"
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:/root/.axon_site"
for B in 4 8 16; do
  for GATE in 0 32; do
    echo "[ab] batch=$B gate=$GATE $(date +%H:%M:%S)" >&2
    LINE=$(CHATTERBOX_FLASH_MAX_UTT=$GATE timeout 2400 python bench.py \
             --batch "$B" --iters 3 2>/tmp/ab_flash_stderr_${B}_${GATE}.log)
    echo "{\"batch\": $B, \"flash_max_utt\": $GATE, \"result\": ${LINE:-null}}" \
      | tee -a "$OUT"
  done
done
echo "[ab] done $(date +%H:%M:%S)" >&2
