"""Pickle IO round-trip + reference-format import tests."""

import pickle

import numpy as np

from transferable3d_tpu.core import bins as bins_lib
from transferable3d_tpu.core.geometry import box_corners_np
from transferable3d_tpu.data import pickle_io, synthetic
from transferable3d_tpu.data.provider import FrustumDataset

CFG = bins_lib.SUNRGBD


def test_native_roundtrip(tmp_path):
    recs = synthetic.make_dataset(8, CFG, seed=0)
    path = str(tmp_path / "train.pkl")
    pickle_io.save_records(recs, path)
    loaded = pickle_io.load_records(str(tmp_path), split="train")
    assert len(loaded) == 8
    for a, b in zip(recs, loaded):
        np.testing.assert_array_equal(a.points, b.points)
        np.testing.assert_array_equal(a.seg, b.seg)
        assert a.class_idx == b.class_idx
        np.testing.assert_allclose(a.center, b.center)
    # Usable by the provider + class filtering.
    ds = FrustumDataset(loaded, CFG, npoints=128)
    assert ds[0]["points"].shape == (128, 4)
    some_class = CFG.classes[recs[0].class_idx]
    filt = pickle_io.load_records(path, classes=[some_class])
    assert all(r.class_idx == recs[0].class_idx for r in filt)
    assert len(filt) >= 1


def test_corners_to_box_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(50):
        center = rng.uniform(-5, 5, 3).astype(np.float32)
        size = rng.uniform(0.5, 4, 3).astype(np.float32)
        heading = np.float32(rng.uniform(-np.pi, np.pi))
        corners = box_corners_np(center, size, heading)
        c, s, h = pickle_io.corners_to_box(corners)
        np.testing.assert_allclose(c, center, atol=1e-4)
        np.testing.assert_allclose(s, size, atol=1e-4)
        # Heading recovered exactly on the circle.
        diff = np.angle(np.exp(1j * (h - heading)))
        assert abs(diff) < 1e-4, (h, heading)


def test_reference_format_import(tmp_path):
    """Emulate the lineage's 9-list pickle layout and import it."""
    recs = synthetic.make_dataset(6, CFG, seed=1)
    ids = [r.frame_id for r in recs]
    box2d = [r.box2d for r in recs]
    box3d = [box_corners_np(r.center, r.size, r.heading) for r in recs]
    pts = [r.points for r in recs]
    seg = [r.seg for r in recs]
    types = [CFG.classes[r.class_idx] for r in recs]
    headings = [float(r.heading) for r in recs]
    sizes = [r.size for r in recs]
    angles = [r.frustum_angle for r in recs]

    path = str(tmp_path / "ref_style.pkl")
    with open(path, "wb") as f:
        for lst in [ids, box2d, box3d, pts, seg, types, headings, sizes,
                    angles]:
            pickle.dump(lst, f, protocol=2)

    loaded = pickle_io.load_records(path, cfg=CFG)
    assert len(loaded) == 6
    for a, b in zip(recs, loaded):
        np.testing.assert_array_equal(a.points, b.points)
        assert a.class_idx == b.class_idx
        np.testing.assert_allclose(a.center, b.center, atol=1e-4)
        np.testing.assert_allclose(a.size, b.size, atol=1e-5)
        assert abs(a.frustum_angle - b.frustum_angle) < 1e-6


def test_reference_detection_format_import(tmp_path):
    recs = synthetic.make_dataset(4, CFG, seed=2)
    path = str(tmp_path / "ref_det.pkl")
    with open(path, "wb") as f:
        for lst in [[r.frame_id for r in recs],
                    [r.box2d for r in recs],
                    [r.points for r in recs],
                    [CFG.classes[r.class_idx] for r in recs],
                    [r.frustum_angle for r in recs],
                    [0.9 for _ in recs]]:
            pickle.dump(lst, f, protocol=2)
    loaded = pickle_io.load_records(path, cfg=CFG)
    assert len(loaded) == 4
    assert loaded[0].seg is None
    assert loaded[0].score == 0.9
