"""Visualization + profiling smoke tests."""

import os

import numpy as np

from transferable3d_tpu.utils import profiling, viz


def test_draw_frustum(tmp_path):
    rng = np.random.RandomState(0)
    pts = rng.normal(size=(500, 3)).astype(np.float32) + [0, 0, 10]
    seg = rng.randint(0, 2, 500)
    path = viz.draw_frustum(
        pts, gt_box=([0, 0, 10], [2, 1, 1], 0.3),
        pred_box=([0.2, 0, 10.1], [2, 1, 1], 0.4), seg=seg,
        path=str(tmp_path / "f.png"), title="test")
    assert os.path.exists(path) and os.path.getsize(path) > 1000


def test_draw_scene_bev(tmp_path):
    rng = np.random.RandomState(1)
    pts = rng.uniform(-20, 20, (2000, 3)).astype(np.float32)
    path = viz.draw_scene_bev(
        pts, gt_boxes=[([0, 0, 10], [4, 2, 1.5], 0.0)],
        pred_boxes=[([0.5, 0, 10], [4, 2, 1.5], 0.1)],
        path=str(tmp_path / "bev.png"))
    assert os.path.exists(path) and os.path.getsize(path) > 1000


def test_step_timer():
    t = profiling.StepTimer(warmup=2)
    for _ in range(10):
        t.tick()
    assert t.rate() > 0


def test_trace_noop_and_real(tmp_path):
    with profiling.trace(None):
        pass
    with profiling.trace(str(tmp_path / "prof")):
        import jax.numpy as jnp
        _ = jnp.ones(8).sum()
    # Trace directory created with content.
    assert os.path.exists(str(tmp_path / "prof"))
