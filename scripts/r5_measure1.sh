#!/bin/bash
# Round-4 batch 3: validate + measure the prefix-sum-rank kernels
# (tri operand removed), per-scale EXTRACT_MB defaults, and the
# lane-safe optimizer flatten (e2e 0.83 ms relayout fix).
set -x
cd /root/repo
LOG=${T3D_LOG:-/root/repo/artifacts/r5_measure1.log}
echo "=== $(date -u) start ===" >> $LOG

echo "=== validate fused-SA kernels on TPU (prefix-sum rank) ===" >> $LOG
if ! timeout 3000 python scripts/validate_sa_tpu.py >> $LOG 2>&1; then
  echo "VALIDATION FAILED — aborting batch" >> $LOG
  exit 1
fi

echo "=== per-stage timings (new defaults) ===" >> $LOG
timeout 2400 python scripts/bench_v2_stages.py >> $LOG 2>&1

echo "=== v2 train bench ===" >> $LOG
T3D_MODEL=v2 timeout 2400 python bench.py >> $LOG 2>&1

echo "=== e2e train bench (lane-safe flatten) ===" >> $LOG
T3D_E2E=1 timeout 2400 python bench.py >> $LOG 2>&1

echo "=== v1 train bench (lane-safe flatten sanity) ===" >> $LOG
timeout 2400 python bench.py >> $LOG 2>&1

echo "=== scoped-vmem probe: 32M + EXTRACT_MB=32, seg+box sa1 ===" >> $LOG
LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=32768 T3D_SA_EXTRACT_MB=32 \
  timeout 2400 python scripts/bench_v2_stages.py --stages seg_sa1,box_sa1 >> $LOG 2>&1

echo "=== $(date -u) done ===" >> $LOG
