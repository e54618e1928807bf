#!/bin/bash
# Fired when the TPU relay returns. Appends to /tmp/tpu_sweep.log.
# Ordered by artifact importance (round may end mid-run).
set -x
cd /root/repo
LOG=/tmp/tpu_sweep.log
echo "=== $(date -u) start ===" >> $LOG

echo "=== stage 0: kernel validation ===" >> $LOG
timeout 3000 python scripts/validate_sa_tpu.py >> $LOG 2>&1 || {
  echo "VALIDATION FAILED" >> $LOG; exit 1; }

echo "=== stage 1: v2 train bench ===" >> $LOG
T3D_MODEL=v2 timeout 2400 python bench.py >> $LOG 2>&1

echo "=== stage 2: per-stage timings ===" >> $LOG
timeout 2400 python scripts/bench_v2_stages.py >> $LOG 2>&1

echo "=== stage 3: all-mode bench artifact ===" >> $LOG
timeout 6000 python bench.py --all >> $LOG 2>&1

echo "=== stage 4: chain-rows / extract sweeps ===" >> $LOG
for ROWS in 8192 16384; do
  echo "--- T3D_SA_CHAIN_ROWS=$ROWS ---" >> $LOG
  T3D_SA_CHAIN_ROWS=$ROWS timeout 2400 python scripts/bench_v2_stages.py >> $LOG 2>&1
done
for MB in 16 32; do
  echo "--- T3D_SA_EXTRACT_MB=$MB ---" >> $LOG
  T3D_SA_EXTRACT_MB=$MB timeout 2400 python scripts/bench_v2_stages.py >> $LOG 2>&1
done
echo "--- T3D_PLANAR_TOP=store ---" >> $LOG
T3D_PLANAR_TOP=store timeout 2400 python scripts/bench_v2_stages.py >> $LOG 2>&1
echo "--- T3D_PLANAR_MIN_ROWS=2048 ---" >> $LOG
T3D_PLANAR_MIN_ROWS=2048 timeout 2400 python scripts/bench_v2_stages.py >> $LOG 2>&1

echo "=== stage 5: per-kernel fused-SA profile (v2 residue) ===" >> $LOG
timeout 2400 python scripts/profile_sa_kernels.py >> $LOG 2>&1

echo "=== stage 6: profile diffs (verdict item 5 discrepancies) ===" >> $LOG
timeout 2400 python scripts/profile_step.py v1 >> $LOG 2>&1
timeout 2400 python scripts/profile_step.py v2 >> $LOG 2>&1

echo "=== $(date -u) done ===" >> $LOG
