#!/usr/bin/env bash
# Canonical flag set: F-PointNet v1 on KITTI car/ped/cyclist (config 3).
set -euo pipefail
t3d-train \
  --preset config3_kitti \
  --data_path "${T3D_KITTI_FRUSTUMS:-data/kitti_frustum}" \
  --log_dir "${LOG_DIR:-log_kitti}" \
  "$@"
