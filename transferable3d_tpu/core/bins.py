"""Heading / size bin parameterization + dataset class constants.

Capability parity target: the reference's `models/model_util.py` constants
(NUM_HEADING_BIN, per-class mean sizes, NUM_OBJECT_POINT) and the
angle<->class / size<->class codecs used by `train/provider.py` — see
SURVEY.md C7/C4 and Appendix A. The reference mount was empty, so the math
follows the Frustum-PointNets spec (arXiv:1711.08488 §Box-Estimation):

  * heading: the continuous heading angle theta (about the camera-Y /
    gravity axis) is discretized into NUM_HEADING_BIN equal bins, centered
    so that bin k covers [k*w - w/2, k*w + w/2) with w = 2*pi/NB; the
    network classifies the bin and regresses the in-bin residual
    (normalized by w/2 in the loss).
  * size: one cluster per category with a per-class mean (l, w, h); the
    network classifies the cluster and regresses the per-dimension
    residual (normalized by the mean size in the loss).

All codecs here are pure functions implemented twice: a numpy host version
(``*_np``, used by data providers / eval) and a jax version (same name,
jit-safe, static shapes) so the same math runs inside the compiled train
step without host round-trips.

Mean sizes are DATASET STATISTICS (not code): defaults below are the
commonly published per-class average box dimensions for KITTI-object and
SUN-RGBD; `scripts/recompute_mean_sizes.py`-style recomputation from the
actual training split is supported via `MeanSizeTable.from_boxes`.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Constants (SURVEY.md Appendix A)
# ---------------------------------------------------------------------------

NUM_HEADING_BIN = 12
NUM_OBJECT_POINT = 512  # points fed to T-Net / box head after masking

# SUN-RGBD: the 10 classes used by the reference pipeline.
SUNRGBD_CLASSES: Tuple[str, ...] = (
    "bed",
    "table",
    "sofa",
    "chair",
    "toilet",
    "desk",
    "dresser",
    "night_stand",
    "bookshelf",
    "bathtub",
)

# KITTI: classes with size clusters (detection whitelist is car/ped/cyclist).
KITTI_CLASSES: Tuple[str, ...] = (
    "Car",
    "Van",
    "Truck",
    "Pedestrian",
    "Person_sitting",
    "Cyclist",
    "Tram",
    "Misc",
)

# Per-class mean (l, w, h) in meters — dataset statistics (defaults from the
# published KITTI-object / SUN-RGBD training-split averages; recomputable).
KITTI_MEAN_SIZES: Dict[str, Tuple[float, float, float]] = {
    "Car": (3.883, 1.629, 1.526),
    "Van": (5.068, 1.901, 2.205),
    "Truck": (10.136, 2.585, 3.252),
    "Pedestrian": (0.844, 0.661, 1.763),
    "Person_sitting": (0.801, 0.598, 1.275),
    "Cyclist": (1.763, 0.597, 1.737),
    "Tram": (16.172, 2.532, 3.531),
    "Misc": (3.643, 1.543, 1.923),
}

SUNRGBD_MEAN_SIZES: Dict[str, Tuple[float, float, float]] = {
    "bed": (2.114, 1.620, 0.927),
    "table": (1.280, 0.791, 0.718),
    "sofa": (1.867, 0.924, 0.845),
    "chair": (0.592, 0.553, 0.827),
    "toilet": (0.699, 0.454, 0.756),
    "desk": (1.346, 0.695, 0.736),
    "dresser": (0.529, 1.003, 1.173),
    "night_stand": (0.501, 0.632, 0.683),
    "bookshelf": (0.405, 1.071, 1.689),
    "bathtub": (0.766, 1.398, 0.473),
}


@dataclasses.dataclass(frozen=True)
class BinConfig:
    """Static bin configuration for one dataset.

    Frozen + hashable so it can be a static argument to jitted functions.
    """

    classes: Tuple[str, ...]
    mean_sizes: Tuple[Tuple[float, float, float], ...]  # per class (l, w, h)
    num_heading_bin: int = NUM_HEADING_BIN

    @property
    def num_size_cluster(self) -> int:
        return len(self.mean_sizes)

    @property
    def num_classes(self) -> int:
        return len(self.classes)

    @property
    def box_output_dim(self) -> int:
        # 3 (center) + 2*NH (heading scores + residuals) + 4*NS (size scores
        # + 3 residuals per cluster)
        return 3 + 2 * self.num_heading_bin + 4 * self.num_size_cluster

    def mean_size_array(self) -> np.ndarray:
        return np.asarray(self.mean_sizes, dtype=np.float32)

    def class_index(self, name: str) -> int:
        return self.classes.index(name)

    @staticmethod
    def sunrgbd() -> "BinConfig":
        return BinConfig(
            classes=SUNRGBD_CLASSES,
            mean_sizes=tuple(SUNRGBD_MEAN_SIZES[c] for c in SUNRGBD_CLASSES),
        )

    @staticmethod
    def kitti() -> "BinConfig":
        return BinConfig(
            classes=KITTI_CLASSES,
            mean_sizes=tuple(KITTI_MEAN_SIZES[c] for c in KITTI_CLASSES),
        )

    @staticmethod
    def from_boxes(
        classes: Sequence[str], labels: np.ndarray, sizes: np.ndarray
    ) -> "BinConfig":
        """Recompute mean sizes from data: labels [M] int, sizes [M,3]."""
        means = []
        for k in range(len(classes)):
            sel = sizes[labels == k]
            means.append(tuple(float(x) for x in sel.mean(axis=0)))
        return BinConfig(classes=tuple(classes), mean_sizes=tuple(means))


SUNRGBD = BinConfig.sunrgbd()
KITTI = BinConfig.kitti()


# ---------------------------------------------------------------------------
# Heading codecs
# ---------------------------------------------------------------------------

def angle_to_class_np(angle: np.ndarray, num_bin: int = NUM_HEADING_BIN):
    """Continuous heading -> (bin index, residual). Host numpy version."""
    angle = np.mod(angle, 2 * np.pi)
    w = 2 * np.pi / num_bin
    shifted = np.mod(angle + w / 2.0, 2 * np.pi)
    cls = np.floor(shifted / w).astype(np.int32)
    residual = shifted - (cls * w + w / 2.0)
    return cls, residual.astype(np.float32)


def class_to_angle_np(cls: np.ndarray, residual: np.ndarray,
                      num_bin: int = NUM_HEADING_BIN,
                      limit_period: bool = True) -> np.ndarray:
    w = 2 * np.pi / num_bin
    angle = cls * w + residual
    if limit_period:
        angle = np.mod(angle, 2 * np.pi)
        angle = np.where(angle > np.pi, angle - 2 * np.pi, angle)
    return angle.astype(np.float32)


def angle_to_class(angle: jnp.ndarray, num_bin: int = NUM_HEADING_BIN):
    """jit-safe heading encoder."""
    angle = jnp.mod(angle, 2 * jnp.pi)
    w = 2 * jnp.pi / num_bin
    shifted = jnp.mod(angle + w / 2.0, 2 * jnp.pi)
    cls = jnp.floor(shifted / w).astype(jnp.int32)
    residual = shifted - (cls.astype(angle.dtype) * w + w / 2.0)
    return cls, residual


def class_to_angle(cls: jnp.ndarray, residual: jnp.ndarray,
                   num_bin: int = NUM_HEADING_BIN) -> jnp.ndarray:
    w = 2 * jnp.pi / num_bin
    angle = cls.astype(residual.dtype) * w + residual
    angle = jnp.mod(angle, 2 * jnp.pi)
    return jnp.where(angle > jnp.pi, angle - 2 * jnp.pi, angle)


# ---------------------------------------------------------------------------
# Size codecs
# ---------------------------------------------------------------------------

def size_to_class_np(size: np.ndarray, class_idx: np.ndarray,
                     cfg: BinConfig):
    """Size cluster = semantic class (one cluster per class, per reference).

    size [..., 3] (l, w, h); class_idx [...] int. Returns (cluster, residual).
    """
    means = cfg.mean_size_array()  # [NS, 3]
    cluster = class_idx.astype(np.int32)
    residual = size - means[cluster]
    return cluster, residual.astype(np.float32)


def class_to_size_np(cluster: np.ndarray, residual: np.ndarray,
                     cfg: BinConfig) -> np.ndarray:
    means = cfg.mean_size_array()
    return (means[cluster] + residual).astype(np.float32)


def size_to_class(size: jnp.ndarray, class_idx: jnp.ndarray, cfg: BinConfig):
    means = jnp.asarray(cfg.mean_size_array())
    cluster = class_idx.astype(jnp.int32)
    residual = size - means[cluster]
    return cluster, residual


def class_to_size(cluster: jnp.ndarray, residual: jnp.ndarray,
                  cfg: BinConfig) -> jnp.ndarray:
    means = jnp.asarray(cfg.mean_size_array())
    return means[cluster] + residual
