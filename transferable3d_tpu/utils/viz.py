"""Point-cloud / 3D-box visualization (headless matplotlib).

Capability parity target: the reference's mayavi tooling (SURVEY.md C15,
`viz_util.draw_lidar` / `draw_gt_boxes3d`). mayavi is not in this image;
matplotlib (Agg) renders the same content to PNG: BEV scatter + box
footprints, and a 3-view (BEV / front / side) frustum figure.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from transferable3d_tpu.core.geometry import box_corners_np  # noqa: E402

# Top-face ring + verticals of the canonical corner ordering.
_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0),
          (4, 5), (5, 6), (6, 7), (7, 4),
          (0, 4), (1, 5), (2, 6), (3, 7)]


def _draw_box_2d(ax, corners: np.ndarray, dims: Tuple[int, int],
                 color: str, label: Optional[str] = None):
    for a, b in _EDGES:
        ax.plot([corners[a, dims[0]], corners[b, dims[0]]],
                [corners[a, dims[1]], corners[b, dims[1]]],
                color=color, linewidth=1.0,
                label=label if (a, b) == (0, 1) else None)


def draw_frustum(points: np.ndarray,
                 gt_box: Optional[Tuple] = None,
                 pred_box: Optional[Tuple] = None,
                 seg: Optional[np.ndarray] = None,
                 path: str = "frustum.png",
                 title: str = "") -> str:
    """3-view render of one frustum. Boxes are (center, size, heading).

    Returns the written path.
    """
    fig, axes = plt.subplots(1, 3, figsize=(15, 5))
    views = [("BEV (x-z)", (0, 2)), ("front (x-y)", (0, 1)),
             ("side (z-y)", (2, 1))]
    colors = (seg if seg is not None
              else np.zeros(points.shape[0]))
    for ax, (name, dims) in zip(axes, views):
        ax.scatter(points[:, dims[0]], points[:, dims[1]], c=colors,
                   s=1, cmap="coolwarm")
        if gt_box is not None:
            corners = box_corners_np(*[np.asarray(x, np.float32)
                                       for x in gt_box])
            _draw_box_2d(ax, corners, dims, "green", "GT")
        if pred_box is not None:
            corners = box_corners_np(*[np.asarray(x, np.float32)
                                       for x in pred_box])
            _draw_box_2d(ax, corners, dims, "red", "pred")
        ax.set_title(name)
        ax.set_aspect("equal")
        if dims[1] == 1:
            ax.invert_yaxis()  # Y is down in our frame
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def draw_scene_bev(points: np.ndarray,
                   gt_boxes: Sequence[Tuple] = (),
                   pred_boxes: Sequence[Tuple] = (),
                   path: str = "scene_bev.png",
                   title: str = "") -> str:
    """Bird's-eye-view of a whole scene (reference `draw_lidar` analog)."""
    fig, ax = plt.subplots(figsize=(10, 10))
    ax.scatter(points[:, 0], points[:, 2], s=0.5, c="gray")
    for box in gt_boxes:
        corners = box_corners_np(*[np.asarray(x, np.float32)
                                   for x in box])
        _draw_box_2d(ax, corners, (0, 2), "green")
    for box in pred_boxes:
        corners = box_corners_np(*[np.asarray(x, np.float32)
                                   for x in box])
        _draw_box_2d(ax, corners, (0, 2), "red")
    ax.set_xlabel("x (m)")
    ax.set_ylabel("z (m)")
    ax.set_aspect("equal")
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path
