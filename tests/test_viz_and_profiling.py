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


def test_export_html(tmp_path):
    rng = np.random.RandomState(0)
    pts = rng.uniform(-3, 3, (500, 4)).astype(np.float32)
    seg = (pts[:, 0] > 0).astype(np.float32)
    path = viz.export_html(
        pts,
        boxes=[{"center": [0, 0, 1], "size": [1, 2, 3], "heading": 0.3,
                "label": "gt"},
               {"corners": np.zeros((8, 3)), "color": "#f00"}],
        seg=seg, path=str(tmp_path / "scene.html"), title="t")
    html = open(path).read()
    # Self-contained: data embedded, no external references.
    assert "const DATA" in html and "http" not in html.split("<body>")[1]
    assert html.count('"corners"') == 2
    assert "#ff7043" in html  # seg coloring applied


def test_export_html_escapes_script_breakout(tmp_path):
    """A '</script>' in a label or title must not escape the script tag
    (advisor finding, round 3)."""
    pts = np.zeros((10, 3), np.float32)
    path = viz.export_html(
        pts,
        boxes=[{"center": [0, 0, 1], "size": [1, 1, 1], "heading": 0.0,
                "label": "</script><script>alert(1)</script>"}],
        path=str(tmp_path / "x.html"),
        title="<b>evil</b></title>")
    html = open(path).read()
    body = html.split("<body>")[1]
    # No raw '<' survives inside the embedded JSON payload.
    payload = body.split("const DATA = ")[1].split(";\n")[0]
    assert "<" not in payload
    import json as _json
    data = _json.loads(payload)
    assert data["boxes"][0]["label"].startswith("</script>")
    # Title is HTML-escaped everywhere it is interpolated.
    assert "<b>evil</b>" not in html


def test_export_html_subsamples(tmp_path):
    pts = np.zeros((1000, 3), np.float32)
    path = viz.export_html(pts, path=str(tmp_path / "s.html"),
                           max_points=100)
    import json as _json
    data = _json.loads(open(path).read().split("const DATA = ")[1]
                       .split(";\n")[0])
    assert len(data["points"]) == 100


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
