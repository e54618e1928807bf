"""3D box geometry, frustum-frame rotations, and in-graph rotated IoU.

Capability parity target: the reference's corner math in
`models/model_util.py` (`get_box3d_corners_helper`) and the host-side
`train/box_util.py` IoU (`box3d_iou`, polygon clipping) — SURVEY.md C7/C11.

Coordinate convention (single convention across the framework; data loaders
convert into it):

    "frustum camera frame": X right, Y **down**, Z forward (KITTI-rect
    style). Heading is the rotation about +Y; heading 0 points along +X
    after the frustum rotation aligns the box-center ray with +Z.
    Box size is (l, w, h): l along heading (x before rotation), w across
    (z before rotation), h along Y.

Canonical corner ordering of an axis-aligned centered box (before the
heading rotation), used everywhere (losses, IoU, file writers):

    idx:      0    1    2    3    4    5    6    7
    x (l/2):  +    +    -    -    +    +    -    -
    y (h/2):  -    -    -    -    +    +    +    +      (negative-y = top)
    z (w/2):  +    -    -    +    +    -    -    +

So corners 0-3 are the top face (counter-clockwise when viewed from -Y,
i.e. from above) and 4-7 the bottom face in the same x/z pattern.

TPU-first design note: the reference computed per-step box IoU metrics on
the host via `tf.py_func` (a device<->host sync every train step). Here the
rotated-rectangle intersection (Sutherland–Hodgman against an axis-aligned
rect, exact) is implemented with static shapes and `lax.fori_loop`, so IoU
metrics stay in the compiled step. A numpy twin lives in `box_np.py` for
the offline evaluators.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Canonical corner signs, shape [8, 3] multiplying (l/2, h/2, w/2) on (x,y,z).
_CORNER_SIGNS = np.array(
    [
        [+1, -1, +1],
        [+1, -1, -1],
        [-1, -1, -1],
        [-1, -1, +1],
        [+1, +1, +1],
        [+1, +1, -1],
        [-1, +1, -1],
        [-1, +1, +1],
    ],
    dtype=np.float32,
)


# ---------------------------------------------------------------------------
# Rotations
# ---------------------------------------------------------------------------

def roty_np(t: np.ndarray) -> np.ndarray:
    """Rotation about +Y, batched: t [...] -> [..., 3, 3]."""
    c, s = np.cos(t), np.sin(t)
    zeros, ones = np.zeros_like(c), np.ones_like(c)
    rows = [
        np.stack([c, zeros, s], axis=-1),
        np.stack([zeros, ones, zeros], axis=-1),
        np.stack([-s, zeros, c], axis=-1),
    ]
    return np.stack(rows, axis=-2).astype(np.float32)


def roty(t: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(t), jnp.sin(t)
    zeros, ones = jnp.zeros_like(c), jnp.ones_like(c)
    rows = [
        jnp.stack([c, zeros, s], axis=-1),
        jnp.stack([zeros, ones, zeros], axis=-1),
        jnp.stack([-s, zeros, c], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def rotate_points_y(points: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotate points [..., N, 3] about +Y by angle [...] (active rotation).

    Used for the frustum normalization: rotating the cloud by the frustum
    angle brings the frustum center ray onto +Z.

    Geometry einsums are tiny (3x3) but feed losses/metrics in meters —
    force fp32 MXU precision (TPU default bf16 costs ~6 mm per corner,
    measured on v5e).
    """
    rot = roty(angle)  # [..., 3, 3]
    return jnp.einsum("...ij,...nj->...ni", rot, points,
                      precision=jax.lax.Precision.HIGHEST)


def rotate_points_y_np(points: np.ndarray, angle) -> np.ndarray:
    rot = roty_np(np.asarray(angle))
    return np.einsum("...ij,...nj->...ni", rot, points).astype(points.dtype)


# ---------------------------------------------------------------------------
# Corners
# ---------------------------------------------------------------------------

def box_corners(center: jnp.ndarray, size: jnp.ndarray,
                heading: jnp.ndarray) -> jnp.ndarray:
    """Centers [..., 3], sizes (l,w,h) [..., 3], headings [...] -> [..., 8, 3]."""
    l, w, h = size[..., 0], size[..., 1], size[..., 2]
    half = jnp.stack([l / 2, h / 2, w / 2], axis=-1)  # matches sign columns
    signs = jnp.asarray(_CORNER_SIGNS)  # [8, 3]
    local = signs * half[..., None, :]  # [..., 8, 3]
    rot = roty(heading)  # [..., 3, 3]
    rotated = jnp.einsum("...ij,...nj->...ni", rot, local,
                         precision=jax.lax.Precision.HIGHEST)
    return rotated + center[..., None, :]


def box_corners_np(center: np.ndarray, size: np.ndarray,
                   heading: np.ndarray) -> np.ndarray:
    l, w, h = size[..., 0], size[..., 1], size[..., 2]
    half = np.stack([l / 2, h / 2, w / 2], axis=-1)
    local = _CORNER_SIGNS * half[..., None, :]
    rot = roty_np(np.asarray(heading))
    rotated = np.einsum("...ij,...nj->...ni", rot, local)
    return (rotated + center[..., None, :]).astype(np.float32)


# ---------------------------------------------------------------------------
# Exact rotated-BEV intersection, jit-safe (static shapes)
# ---------------------------------------------------------------------------
# Strategy: express box B in box A's yaw frame so A becomes axis-aligned in
# the BEV (x, z) plane; Sutherland–Hodgman clip B's 4-gon against A's four
# half-planes. A convex 4-gon clipped by 4 half-planes has <= 8 vertices, so
# an 8-slot padded buffer is exact, shapes stay static, and the whole thing
# compiles into the train step (vmap'd over the batch).
#
# The clip is fully BRANCH-FREE: every candidate emission (kept vertex or
# edge intersection) is computed for all slots in parallel and compacted
# with a cumsum scatter — no lax.cond / fori_loop, so the vmapped metric
# costs VPU ops only. (The original loop/cond formulation doubled the
# whole train-step time on v5e.)

_MAX_VERTS = 8


def _clip_halfplane(verts: jnp.ndarray, count: jnp.ndarray,
                    normal: jnp.ndarray, offset: jnp.ndarray):
    """Clip polygon (verts [K,2], first `count` valid) to n.p + off >= 0.

    Vectorized Sutherland–Hodgman step: each input edge (p_i, p_{i+1})
    emits p_i (if inside) and the edge/plane intersection (if crossing);
    emissions are compacted order-preservingly via cumsum positions.
    """
    K = verts.shape[0]
    idx = jnp.arange(K)
    active = idx < count
    nxt = jnp.mod(idx + 1, jnp.maximum(count, 1))
    p = verts
    q = verts[nxt]

    dp = p @ normal + offset  # [K]
    dq = q @ normal + offset
    denom = jnp.where(dp - dq == 0, 1e-12, dp - dq)
    inter = p + (dp / denom)[:, None] * (q - p)

    inside = (dp >= 0) & active
    crossing = ((dp >= 0) != (dq >= 0)) & active

    # Interleave candidates [p_0, inter_0, p_1, inter_1, ...] -> [2K, 2].
    cand = jnp.stack([p, inter], axis=1).reshape(2 * K, 2)
    emit = jnp.stack([inside, crossing], axis=1).reshape(2 * K)

    pos = jnp.cumsum(emit) - 1  # target slot per emission
    pos = jnp.where(emit, pos, 2 * K)  # park non-emissions out of range
    out = jnp.zeros((2 * K, 2), verts.dtype).at[pos].set(
        cand, mode="drop")
    return out[:K], jnp.sum(emit).astype(jnp.int32)


def _polygon_area(verts: jnp.ndarray, count: jnp.ndarray) -> jnp.ndarray:
    """Shoelace over the first `count` vertices of verts [K, 2]."""
    K = verts.shape[0]
    idx = jnp.arange(K)
    nxt = jnp.mod(idx + 1, jnp.maximum(count, 1))
    valid = (idx < count).astype(verts.dtype)
    x, z = verts[:, 0], verts[:, 1]
    xn, zn = verts[nxt, 0], verts[nxt, 1]
    cross = (x * zn - xn * z) * valid
    return jnp.abs(jnp.sum(cross)) / 2.0


def bev_intersection_area(center_a, size_a, heading_a,
                          center_b, size_b, heading_b) -> jnp.ndarray:
    """Exact BEV (x,z-plane) intersection area of two rotated boxes.

    All args unbatched: centers [3], sizes (l,w,h) [3], headings scalar.
    vmap for batches.
    """
    # B's BEV corners in A's yaw frame (A axis-aligned afterwards).
    rel_heading = heading_b - heading_a
    # BEV corner pattern for a centered box: (x, z) with signs of corners 0-3.
    signs = jnp.asarray(_CORNER_SIGNS[:4][:, [0, 2]])  # [4, 2]
    half_b = jnp.stack([size_b[0] / 2, size_b[1] / 2])
    local = signs * half_b  # [4, 2]
    c, s = jnp.cos(rel_heading), jnp.sin(rel_heading)
    # +Y rotation acts on (x, z) as x' = c x + s z ; z' = -s x + c z.
    rot = jnp.stack([jnp.stack([c, s]), jnp.stack([-s, c])])
    corners_b = jnp.einsum("ij,nj->ni", rot, local)
    # Translate B's center into A's frame.
    dc = center_b - center_a
    ca, sa = jnp.cos(-heading_a), jnp.sin(-heading_a)
    dx = ca * dc[0] + sa * dc[2]
    dz = -sa * dc[0] + ca * dc[2]
    verts = jnp.pad(corners_b + jnp.stack([dx, dz]),
                    ((0, _MAX_VERTS - 4), (0, 0)))
    count = jnp.int32(4)

    # Clip against A's 4 half-planes: |x| <= l/2, |z| <= w/2.
    la, wa = size_a[0] / 2, size_a[1] / 2
    planes = [
        (jnp.array([1.0, 0.0]), la),
        (jnp.array([-1.0, 0.0]), la),
        (jnp.array([0.0, 1.0]), wa),
        (jnp.array([0.0, -1.0]), wa),
    ]
    for normal, offset in planes:
        verts, count = _clip_halfplane(verts, count, normal, offset)
    return _polygon_area(verts, count)


def box3d_iou(center_a, size_a, heading_a,
              center_b, size_b, heading_b):
    """Exact (3D IoU, BEV IoU) of two boxes; unbatched — vmap for batches.

    jit-safe twin of `box_np.box3d_iou_np` (SURVEY.md C11); used for the
    in-graph IoU>=tau training metrics without any host py_func round-trip.
    """
    inter_area = bev_intersection_area(
        center_a, size_a, heading_a, center_b, size_b, heading_b)
    area_a = size_a[0] * size_a[1]
    area_b = size_b[0] * size_b[1]
    iou_bev = inter_area / jnp.maximum(area_a + area_b - inter_area, 1e-8)

    # Y spans (Y down: box occupies [cy - h/2, cy + h/2]).
    ymin = jnp.maximum(center_a[1] - size_a[2] / 2, center_b[1] - size_b[2] / 2)
    ymax = jnp.minimum(center_a[1] + size_a[2] / 2, center_b[1] + size_b[2] / 2)
    h_overlap = jnp.maximum(ymax - ymin, 0.0)
    inter_vol = inter_area * h_overlap
    vol_a = area_a * size_a[2]
    vol_b = area_b * size_b[2]
    iou3d = inter_vol / jnp.maximum(vol_a + vol_b - inter_vol, 1e-8)
    return iou3d, iou_bev


box3d_iou_batched = jax.vmap(box3d_iou, in_axes=(0, 0, 0, 0, 0, 0))
