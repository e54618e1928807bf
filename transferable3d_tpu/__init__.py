"""transferable3d_tpu — TPU-native (JAX/XLA/Pallas/pjit) rebuild of the
capabilities of yewsiang/Transferable3D (ICCV 2019): Frustum-PointNet 3D
object detection from RGB-D with cross-category semi-supervised transfer.

Blueprint: /root/repo/SURVEY.md (reference mount was empty; survey derived
from BASELINE.json + arXiv:1711.08488 + model knowledge of the lineage).

Layout:
  core/      box parameterization, bin encode/decode, IoU (host + device)
  data/      frustum dataset providers (synthetic, pickle, SUN-RGBD, KITTI)
  models/    flax model graphs (F-PointNet v1/v2, BoxPC) + losses
  ops/       Pallas kernels + point-cloud ops (FPS, ball query, 3-NN)
  parallel/  mesh / sharding helpers (DP over ICI)
  train/     training drivers (supervised + semi-supervised), schedules
  eval/      AP evaluators (SUN-RGBD python, KITTI native)
  utils/     logging, checkpointing, config
"""

__version__ = "0.1.0"
