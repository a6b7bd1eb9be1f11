#!/bin/bash
# Production-geometry TPU soak (VERDICT r4 item 3): >=30 min at 720p on
# the real chip, 4 slots, churn + a SIGTERM fired mid-flight, report
# committed as SOAK_REPORT_TPU_720p.json.  The identity verifier runs a
# solo pipeline per delivered frame on the host-driven device, so the
# tick rate is verifier-bound through this container's tunnel — the
# invariants (identity tolerance, ring leak, generation guard, RSS
# bound, SIGTERM drain) are the product surface, not throughput.
set -u
cd "$(dirname "$0")/.."
dur="${1:-1800}"
# SIGTERM fires 60 s before the end: the recorded duration is the soak
# itself, and the drain is still exercised mid-flight (streams active).
BACKSCRUB_TPU_PLATFORM=tpu exec python tools/soak.py \
  --duration "$dur" --geometry 1280x720 --slots 4 \
  --churn-every 10 --check-every 5 \
  --sigterm --sigterm-at "$((dur - 60))" \
  --rss-budget-mb 4000 \
  --report SOAK_REPORT_TPU_720p.json
