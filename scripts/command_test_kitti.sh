#!/usr/bin/env bash
# Inference + KITTI files + native offline AP (set T3D_KITTI_GT_DIR to the
# ground-truth label dir to trigger the C++ evaluator).
set -euo pipefail
t3d-test \
  --preset config3_kitti \
  --data_path "${T3D_KITTI_FRUSTUMS:-data/kitti_frustum}" \
  --log_dir "${LOG_DIR:-log_kitti}" \
  --result_dir "${RESULT_DIR:-result_kitti}" \
  "$@"
