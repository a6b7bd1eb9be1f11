#!/bin/bash
# Single-era benchmark re-sweep (PERF.md: never mix eras in the record).
# Runs the FULL measurement suite in one session so every number in
# BENCH_DETAILS.json + PARITY_ONCHIP.json + the roofline records is
# stamped from the same program era; takes ~1-2h through the tunnel.
#
# Order matters under a wall clock: the parity record first (it is the
# fidelity artifact; a truncated sweep must never cost it), then the
# config sweep (checkpointed per config), then rooflines, then the
# headline.  Every artifact write is atomic (utils/artifacts.py).
set -u
cd "$(dirname "$0")/.."
log=/tmp/resweep.log
: > "$log"
echo "== resweep start $(date -u +%FT%TZ)" | tee -a "$log"
echo "== parity" | tee -a "$log"
timeout 3600 python bench.py --parity 2>> "$log"
echo "== config sweep" | tee -a "$log"
timeout 7200 python bench.py --all 2>> "$log"
for args in "" "--model deeplab" "--model bodypix" "--batch 16" \
            "--model mlkit" "--model segm_full"; do
  echo "== roofline $args" | tee -a "$log"
  timeout 2400 python tools/roofline.py $args --json-only 2>> "$log"
done
echo "== headline" | tee -a "$log"
timeout 1800 python bench.py 2>> "$log"
echo "== resweep done $(date -u +%FT%TZ)" | tee -a "$log"
