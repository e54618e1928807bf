#!/usr/bin/env bash
# Cross-category transfer: strong (bed/table/sofa/chair) -> weak rest
# (BASELINE config 4).
set -euo pipefail
t3d-train-semisup \
  --data_path "${T3D_SUNRGBD_FRUSTUMS:-data/sunrgbd_frustum}" \
  --num_point 1024 --num_channels 6 \
  --strong_classes "bed,table,sofa,chair" \
  --weak_classes "toilet,desk,dresser,night_stand,bookshelf,bathtub" \
  --log_dir "${LOG_DIR:-log_semisup}" \
  "$@"
