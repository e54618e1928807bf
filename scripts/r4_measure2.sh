#!/bin/bash
# Round-4 measurement batch 2 (after the respawn-cut sweep):
#   (a) stage 5: per-kernel fused-SA residue profile (seg-SA1)
#   (b) scoped-vmem probe: can --xla_tpu_scoped_vmem_limit_kib unlock
#       EXTRACT_MB>16 (the MB=32 point OOMed at 17.75M vs 16M)?
#   (c) stage 6: v1/v2 whole-step profiles (verdict item 5 discrepancies)
set -x
cd /root/repo
LOG=/root/repo/artifacts/r4_measure2.log
echo "=== $(date -u) start ===" >> $LOG

echo "=== stage 5: per-kernel fused-SA profile (EXTRACT_MB=16) ===" >> $LOG
T3D_SA_EXTRACT_MB=16 timeout 2400 python scripts/profile_sa_kernels.py >> $LOG 2>&1

echo "=== scoped-vmem probe: 32M limit + EXTRACT_MB=32, seg_sa1+box_sa1 only ===" >> $LOG
XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=32768 T3D_SA_EXTRACT_MB=32 \
  timeout 2400 python scripts/bench_v2_stages.py --stages seg_sa1,box_sa1 >> $LOG 2>&1

echo "=== stage 6: v1 profile ===" >> $LOG
timeout 2400 python scripts/profile_step.py v1 >> $LOG 2>&1
echo "=== stage 6: v2 profile (EXTRACT_MB=16) ===" >> $LOG
T3D_SA_EXTRACT_MB=16 timeout 2400 python scripts/profile_step.py v2 >> $LOG 2>&1

echo "=== $(date -u) done ===" >> $LOG
