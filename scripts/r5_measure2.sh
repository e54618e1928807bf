#!/bin/bash
# Round-5 batch 2: validate + measure the pool-slices rewrite
# (_fwd_pool_ymax_kernel_cp / _infer_kernel_p static-slice segment max)
# and run the bwd_step0 attribution ablation. Every stage self-reports
# ok/failed (round-4 verdict: silent sweep deaths read as "no change").
set -u
cd /root/repo
log() { echo "=== $(date -u) $1 ==="; }

log "stage V: validate_sa_tpu"
if timeout 3600 python scripts/validate_sa_tpu.py; then
  echo "stage V ok"
else
  echo "stage V FAILED rc=$? — aborting (do not trust timings below)"
  exit 1
fi

log "stage S: per-stage timings"
timeout 2400 python scripts/bench_v2_stages.py && echo "stage S ok" \
  || echo "stage S FAILED rc=$?"

log "stage B: v2 train bench"
timeout 1800 env T3D_MODEL=v2 python bench.py && echo "stage B ok" \
  || echo "stage B FAILED rc=$?"

log "stage I: v2 infer bench"
timeout 1800 env T3D_MODEL=v2 python bench.py --infer && echo "stage I ok" \
  || echo "stage I FAILED rc=$?"

log "stage A: bwd_step0 attribution ablation"
for v in b:b0/dz b:b0/noacch b:b0/nomm b:b0/noseg b:b0/accht \
         c:b0/dz c:b0/noacch c:b0/nomm c:b0/noseg c:b0/accht \
         c:pool/slices; do
  echo "--- $v $(date -u +%H:%M:%S) ---"
  timeout 900 python scripts/ablate_sa_passes.py --only "$v" \
    || echo "  $v rc=$? (timeout/fail)"
done
echo "stage A ok (per-variant failures reported inline)"
log "ALLDONE"
