"""Fused on-device frustum preprocessing (the BASELINE.json north-star).

Capability parity target: the reference's *offline, host-side* frustum
extraction (SURVEY.md C2/C3, call stack §3.1 — "HOT LOOP (host CPU,
hours)"). Rebuilt as a single jit-compiled pass per BASELINE.json:
"2D box + depth map -> frustum point cloud -> frustum-frame rotation ->
fixed-size point sampling", so training can consume raw depth maps with
zero host preprocessing.

Everything is shape-static:
  * depth [H, W] lifts to a dense point grid (invalid depths masked);
  * per 2D box: in-box mask; `npoints` sampled among masked pixels by
    top-k over random keys (uniform without replacement), wrapping
    cyclically when the frustum has fewer than `npoints` pixels —
    identical semantics to the host provider's resample-with-replacement;
  * frustum angle from the box-center ray; points rotated about +Y so
    that ray hits +Z — bit-matching `provider.rotate_to_center`.

vmap over the boxes of one frame; jit once per (H, W, npoints) shape.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from transferable3d_tpu.core import geometry


class FrustumBatch(NamedTuple):
    points: jnp.ndarray         # [B, npoints, C] rotated to frustum frame
    frustum_angle: jnp.ndarray  # [B]
    count: jnp.ndarray          # [B] number of valid pixels in the frustum


def depth_to_camera_points(depth: jnp.ndarray, K: jnp.ndarray
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Depth [H, W] (meters; <=0 invalid) -> (points [H*W, 3], valid).

    Camera frame: X right, Y down, Z forward (our canonical frame).
    """
    h, w = depth.shape
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    z = depth
    x = (u - K[0, 2]) * z / K[0, 0]
    y = (v - K[1, 2]) * z / K[1, 1]
    pts = jnp.stack([x, y, z], axis=-1).reshape(h * w, 3)
    valid = (depth > 1e-6).reshape(h * w)
    return pts, valid


_LANES = 128  # tile width for the two-level rank select


def _select_systematic(pts: jnp.ndarray, inside: jnp.ndarray,
                       npoints: int, u: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Systematic rank-select of `npoints` rows among `inside` rows.

    Replaces the round-2 approx_max_k + 131k-row-gather sampler
    (VERDICT r02 item 3: the two remaining e2e costs). Slot i takes the
    in-box point of cumulative rank 1 + floor((i + u) * count /
    npoints) — a systematic (random-phase u in [0,1)) sample: uniform
    marginal inclusion, without replacement when count >= npoints,
    cyclic with-replacement coverage otherwise; identical in
    expectation to the host provider's resample-with-replacement, and
    deliberately monotone so selection becomes two one-hot MXU
    contractions (tile search over T = N/128 tile offsets, then a lane
    match) instead of a sort/top-k plus a scalar-unit gather
    (~10 ns/row on TPU, CLAUDE.md lore).

    pts [N, C] f32 with N a multiple of 128; inside [N] bool.
    Returns (sampled [npoints, C], count). count == 0 yields zeros.
    """
    n, c = pts.shape
    assert n % _LANES == 0, n
    t = n // _LANES
    insf = inside.astype(jnp.float32).reshape(t, _LANES)
    # In-tile cumulative rank at each pixel (inclusive), via a
    # triangular matmul (operands are 0/1, exact at any precision),
    # plus exclusive tile offsets for the global rank bookkeeping.
    tri = jnp.tril(jnp.ones((_LANES, _LANES), jnp.float32))
    in_tile = jax.lax.dot_general(
        insf, tri, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # [T, LANES]
    tile_tot = in_tile[:, -1]                        # [T]
    tile_end = jnp.cumsum(tile_tot)                  # inclusive [T]
    tile_start = tile_end - tile_tot                 # exclusive [T]
    count = tile_end[-1]
    # In-tile rank is only meaningful AT in-box pixels; zero elsewhere
    # so plateau values never match (wanted lane ranks are >= 1). Key
    # TPU constraint: everything flowing through the fetch matmul below
    # must be EXACT under the MXU's default bf16 input rounding —
    # global ranks (up to N) are not, but in-tile ranks (<= 128) are,
    # and f32 coordinates split exactly into bf16 hi + lo parts.
    # (Precision.HIGHEST would also be exact but compiles/runs the
    # 6-pass lowering; measured unusably slow through the axon relay.)
    lrank = jnp.where(insf > 0, in_tile, 0.0)        # [T, LANES] <= 128

    slot = jnp.arange(npoints, dtype=jnp.float32)
    want = 1.0 + jnp.floor((slot + u) * count / npoints)  # [np] monotone
    want = jnp.minimum(want, jnp.maximum(count, 1.0))

    # Level 1: which tile holds global rank `want` (one-hot over T).
    t_oh = ((want[:, None] > tile_start[None, :])
            & (want[:, None] <= tile_end[None, :])).astype(jnp.float32)
    # The selected tile's exclusive start, via a VPU masked max (not a
    # matmul: tile_start can exceed bf16's exact-integer range).
    sel_start = jnp.max(jnp.where(t_oh > 0, tile_start[None, :], -1.0),
                        axis=1)                      # [np]
    # Level 2: fetch the selected tile's (lrank, hi, lo) rows with ONE
    # [np, T] @ [T, LANES*(1+2C)] contraction, then lane-match against
    # the in-tile rank `want - sel_start`.
    hi = pts.astype(jnp.bfloat16).astype(jnp.float32)
    lo = pts - hi
    vals = jnp.concatenate([hi, lo], -1).reshape(t, _LANES, 2 * c)
    packed = jnp.concatenate(
        [lrank[:, :, None], vals], axis=-1).reshape(t, _LANES * (1 + 2 * c))
    fetched = jax.lax.dot_general(
        t_oh, packed, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(
            npoints, _LANES, 1 + 2 * c)
    l_oh = (fetched[:, :, 0] == (want - sel_start)[:, None]).astype(
        jnp.float32)
    picked = jnp.einsum("pl,plc->pc", l_oh, fetched[:, :, 1:])
    sampled = picked[:, :c] + picked[:, c:]
    return sampled, count.astype(jnp.int32)


def _sample_in_box(pts: jnp.ndarray, uv: jnp.ndarray, valid: jnp.ndarray,
                   box2d: jnp.ndarray, K: jnp.ndarray, npoints: int,
                   rng: jax.Array) -> Tuple[jnp.ndarray, jnp.ndarray,
                                            jnp.ndarray]:
    """One frustum: mask pixels in box2d, sample npoints, rotate."""
    inside = (valid
              & (uv[:, 0] >= box2d[0]) & (uv[:, 0] < box2d[2])
              & (uv[:, 1] >= box2d[1]) & (uv[:, 1] < box2d[3]))

    n = pts.shape[0]
    if n % _LANES:  # pad to a lane multiple (KITTI cloud path)
        pad = _LANES - n % _LANES
        pts = jnp.pad(pts, ((0, pad), (0, 0)))
        inside = jnp.pad(inside, (0, pad))
    u = jax.random.uniform(rng, ())
    sampled, count = _select_systematic(pts, inside, npoints, u)

    # Frustum angle from the 2D box center ray (unit depth).
    cu = (box2d[0] + box2d[2]) / 2.0
    cv = (box2d[1] + box2d[3]) / 2.0
    rx = (cu - K[0, 2]) / K[0, 0]
    angle = -jnp.arctan2(rx, 1.0)

    xyz = geometry.rotate_points_y(sampled[None, :, :3], angle[None])[0]
    sampled = jnp.concatenate([xyz, sampled[:, 3:]], axis=-1)
    return sampled, angle, count


@partial(jax.jit, static_argnums=(3,))
def lift_depth_frustums(depth: jnp.ndarray, K: jnp.ndarray,
                        boxes2d: jnp.ndarray, npoints: int,
                        rng: jax.Array) -> FrustumBatch:
    """Depth map [H, W] + boxes2d [B, 4] -> FrustumBatch (one jit pass)."""
    pts, valid = depth_to_camera_points(depth, K)
    h, w = depth.shape
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
    uv = jnp.stack([u, v], axis=-1)

    b = boxes2d.shape[0]
    rngs = jax.random.split(rng, b)
    points, angles, counts = jax.vmap(
        lambda box, r: _sample_in_box(pts, uv, valid, box, K, npoints, r)
    )(boxes2d, rngs)
    return FrustumBatch(points=points, frustum_angle=angles, count=counts)


@partial(jax.jit, static_argnums=(3,))
def crop_point_frustums(points: jnp.ndarray, K: jnp.ndarray,
                        boxes2d: jnp.ndarray, npoints: int,
                        rng: jax.Array) -> FrustumBatch:
    """Point-cloud variant (KITTI velodyne already in camera frame):
    points [N, 3+C] -> FrustumBatch via on-device projection + crop."""
    xyz = points[:, :3]
    z = jnp.maximum(xyz[:, 2], 1e-6)
    u = K[0, 0] * xyz[:, 0] / z + K[0, 2]
    v = K[1, 1] * xyz[:, 1] / z + K[1, 2]
    uv = jnp.stack([u, v], axis=-1)
    valid = xyz[:, 2] > 1e-6

    b = boxes2d.shape[0]
    rngs = jax.random.split(rng, b)
    out_points, angles, counts = jax.vmap(
        lambda box, r: _sample_in_box(points, uv, valid, box, K, npoints,
                                      r))(boxes2d, rngs)
    return FrustumBatch(points=out_points, frustum_angle=angles,
                        count=counts)
