#!/bin/bash
# Single-era benchmark re-sweep (PERF.md: never mix eras in the record).
# Runs the FULL measurement suite in one session so every number in
# BENCH_DETAILS.json + PARITY_ONCHIP.json + the roofline records is
# stamped from the same program era; takes ~1-2h through the tunnel.
set -u
cd "$(dirname "$0")/.."
log=/tmp/resweep.log
: > "$log"
echo "== resweep start $(date -u +%FT%TZ)" | tee -a "$log"
python bench.py --all 2>> "$log"
for args in "" "--batch 16" "--model deeplab" "--model bodypix" \
            "--model mlkit" "--model segm_full"; do
  echo "== roofline $args" | tee -a "$log"
  timeout 2400 python tools/roofline.py $args --json-only 2>> "$log"
done
echo "== parity" | tee -a "$log"
python bench.py --parity 2>> "$log"
echo "== headline" | tee -a "$log"
python bench.py 2>> "$log"
echo "== resweep done $(date -u +%FT%TZ)" | tee -a "$log"
