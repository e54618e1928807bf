#!/bin/bash
# Round-5 recovery batch: fired by /tmp/tpu_watch.sh when the relay
# comes back (outage 2026-08-21: jax.devices() enumerates, every
# compile hangs). Ordered by value-per-minute under a short round:
#   V: hardware validation of the c5512c7 kernel rewrites (abort on
#      failure — timings of wrong kernels are worse than no timings),
#   B: bench.py --all -> bench_all.json (the headline artifact),
#   S: per-stage fused-SA timings (the stable cross-session comparator),
#   G: __graft_entry__ self-check,
#   A: the bwd/step0 + accht ablation variants r5_measure3 never ran.
# Every stage self-reports ok/FAILED (round-4 verdict: silent sweep
# deaths read as "no change").
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

log "stage B: bench --all"
timeout 7200 python bench.py --all && echo "stage B ok" \
  || echo "stage B FAILED rc=$?"

log "stage S: per-stage v2 timings"
timeout 2400 python scripts/bench_v2_stages.py && echo "stage S ok" \
  || echo "stage S FAILED rc=$?"

log "stage P: scoped-vmem probe via LIBTPU_INIT_ARGS"
# r5_measure1 proved the local XLA flag parser rejects
# --xla_tpu_scoped_vmem_limit_kib; the axon relay snapshots and
# forwards LIBTPU_INIT_ARGS (see the 'env snapshotted here' line in
# r5_ablate_run2.log), so try the remote-compiler route. EXTRACT_MB=32
# OOMed at 17.75M vs the default 16M scoped limit (r4 stage 4).
LIBTPU_INIT_ARGS="--xla_tpu_scoped_vmem_limit_kib=32768" \
  T3D_SA_EXTRACT_MB=32 \
  timeout 2400 python scripts/bench_v2_stages.py --stages seg_sa1,box_sa1 \
  && echo "stage P ok" || echo "stage P FAILED rc=$?"

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
