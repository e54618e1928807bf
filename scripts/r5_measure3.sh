#!/bin/bash
# Round-5 batch 3: validate + attribute the bwd_step0 rewrite.
#  - waits for the batch-2 ablations to drain (single chip),
#  - stage V: hardware validation of the _mult_from_rank change,
#  - stage G: __graft_entry__ self-check (entry + 8-dev CPU dryrun),
#  - stage A: production bwd/step0 (now elementwise-mm) + the fixed
#    accht scatter-orientation variants -> decides the next rewrite.
# Every stage self-reports ok/failed (round-4 verdict: silent sweep
# deaths read as "no change").
set -u
cd /root/repo
log() { echo "=== $(date -u) $1 ==="; }

if [ -f /tmp/measure2.pid ] && kill -0 "$(cat /tmp/measure2.pid)" 2>/dev/null; then
  log "waiting for batch 2 (pid $(cat /tmp/measure2.pid)) to drain"
  while kill -0 "$(cat /tmp/measure2.pid)" 2>/dev/null; do sleep 30; done
fi
log "batch 2 drained"

log "stage V: validate_sa_tpu"
if timeout 3600 python scripts/validate_sa_tpu.py; then
  echo "stage V ok"
else
  echo "stage V FAILED rc=$? — aborting (do not trust timings below)"
  exit 1
fi

log "stage G: graft entry self-check"
timeout 1800 python __graft_entry__.py && echo "stage G ok" \
  || echo "stage G FAILED rc=$?"

log "stage A: production bwd/step0 + accht orientation"
for v in b:bwd/step0 b:b0/accht c:b0/accht b:b0/nomm; do
  echo "--- $v $(date -u +%H:%M:%S) ---"
  timeout 900 python scripts/ablate_sa_passes.py --only "$v" \
    || echo "  $v rc=$? (timeout/fail)"
done
echo "stage A ok (per-variant failures reported inline)"
log "ALLDONE"
