#!/usr/bin/env bash
# Canonical flag set: full F-PointNet v1 on SUN-RGBD (BASELINE config 2).
# Mirrors the reference's scripts/command_*.sh convention (SURVEY.md C16).
set -euo pipefail
t3d-train \
  --preset config2_fpointnet_v1_sunrgbd \
  --data_path "${T3D_SUNRGBD_FRUSTUMS:-data/sunrgbd_frustum}" \
  --log_dir "${LOG_DIR:-log_v1_sunrgbd}" \
  "$@"
