"""TF1 checkpoint importer test against a synthetically written ckpt."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from transferable3d_tpu.core import bins as bins_lib
from transferable3d_tpu.utils import tf1_import

CFG = bins_lib.SUNRGBD

# Widths per SURVEY.md §3.3 (channels: in -> out per scope).
SEG_CONVS = [("conv1", 4, 64), ("conv2", 64, 64), ("conv3", 64, 64),
             ("conv4", 64, 128), ("conv5", 128, 1024),
             ("conv6", 64 + 1024 + 10, 512), ("conv7", 512, 256),
             ("conv8", 256, 128), ("conv9", 128, 128)]
TNET = [("center_regression_net/conv-reg1-stage1", 3, 128),
        ("center_regression_net/conv-reg2-stage1", 128, 128),
        ("center_regression_net/conv-reg3-stage1", 128, 256)]
BOX = [("conv-reg1", 3, 128), ("conv-reg2", 128, 128),
       ("conv-reg3", 128, 256), ("conv-reg4", 256, 512)]
FCS = [("center_regression_net/fc1-stage1", 256 + 10, 256, True),
       ("center_regression_net/fc2-stage1", 256, 128, True),
       ("center_regression_net/fc3-stage1", 128, 3, False),
       ("fc1", 512 + 10, 512, True), ("fc2", 512, 256, True),
       ("fc3", 256, CFG.box_output_dim, False)]


def _write_ckpt(path, rng):
    tensors = {}
    with tf.Graph().as_default():
        for scope, cin, cout in SEG_CONVS + TNET + BOX:
            w = rng.normal(size=(1, 1, cin, cout)).astype(np.float32)
            b = rng.normal(size=(cout,)).astype(np.float32)
            tensors[f"{scope}/weights"] = tf.Variable(w, name=f"{scope}/weights")
            tensors[f"{scope}/biases"] = tf.Variable(b, name=f"{scope}/biases")
            for stat, init in [("gamma", 1.0), ("beta", 0.0),
                               ("moving_mean", 0.1), ("moving_variance", 0.9)]:
                v = rng.normal(init, 0.01, size=(cout,)).astype(np.float32)
                tensors[f"{scope}/bn/{stat}"] = tf.Variable(
                    v, name=f"{scope}/bn/{stat}")
        tensors["conv10/weights"] = tf.Variable(
            rng.normal(size=(1, 1, 128, 2)).astype(np.float32),
            name="conv10/weights")
        tensors["conv10/biases"] = tf.Variable(
            rng.normal(size=(2,)).astype(np.float32), name="conv10/biases")
        for scope, cin, cout, bn in FCS:
            tensors[f"{scope}/weights"] = tf.Variable(
                rng.normal(size=(cin, cout)).astype(np.float32),
                name=f"{scope}/weights")
            tensors[f"{scope}/biases"] = tf.Variable(
                rng.normal(size=(cout,)).astype(np.float32),
                name=f"{scope}/biases")
            if bn:
                for stat, init in [("gamma", 1.0), ("beta", 0.0),
                                   ("moving_mean", 0.0),
                                   ("moving_variance", 1.0)]:
                    tensors[f"{scope}/bn/{stat}"] = tf.Variable(
                        rng.normal(init, 0.01, size=(cout,)).astype(
                            np.float32), name=f"{scope}/bn/{stat}")
        with tf.compat.v1.Session() as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            saver = tf.compat.v1.train.Saver()
            saver.save(sess, path)
            values = {k: sess.run(v) for k, v in tensors.items()}
    return values


def test_import_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    ckpt = str(tmp_path / "model.ckpt")
    values = _write_ckpt(ckpt, rng)

    params, batch_stats = tf1_import.import_tf1_checkpoint(ckpt)

    # Spot-check shapes + exact values across the tree.
    np.testing.assert_array_equal(
        params["seg_net"]["mlp1"]["dense_0"]["kernel"],
        values["conv1/weights"].reshape(4, 64))
    np.testing.assert_array_equal(
        params["seg_net"]["mlp1"]["bn_0"]["scale"],
        values["conv1/bn/gamma"])
    np.testing.assert_array_equal(
        batch_stats["seg_net"]["mlp2"]["bn_2"]["var"],
        values["conv5/bn/moving_variance"])
    # Concat conv split: rows 0-63 -> mlp3_point, rest -> mlp3_global.
    w6 = values["conv6/weights"].reshape(1098, 512)
    np.testing.assert_array_equal(
        params["seg_net"]["mlp3_point"]["kernel"], w6[:64])
    np.testing.assert_array_equal(
        params["seg_net"]["mlp3_global"]["kernel"], w6[64:])
    np.testing.assert_array_equal(
        params["box_net"]["head"]["out"]["kernel"], values["fc3/weights"])

    # The imported tree must be structurally loadable into the model:
    # same leaf shapes as a fresh init (params may have extra bn trees
    # under fc heads -> compare intersection).
    import jax
    from transferable3d_tpu.models.frustum_pointnet_v1 import (
        FrustumPointNetV1)
    model = FrustumPointNetV1(cfg=CFG)
    pts = rng.normal(size=(2, 64, 4)).astype(np.float32)
    oh = np.eye(10, dtype=np.float32)[[0, 1]]
    ref = model.init({"params": jax.random.PRNGKey(0),
                      "dropout": jax.random.PRNGKey(1)}, pts, oh,
                     train=False)

    flat_ref = dict(jax.tree_util.tree_flatten_with_path(ref["params"])[0])
    flat_imp = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    matched = 0
    for path, leaf in flat_ref.items():
        if path in flat_imp:
            assert flat_imp[path].shape == leaf.shape, path
            matched += 1
    assert matched >= 40  # the bulk of the tree transfers

    # And the model must run with the imported weights merged in.
    def merge(dst, src):
        out = dict(dst)
        for k, v in src.items():
            if isinstance(v, dict) and k in out and isinstance(out[k], dict):
                out[k] = merge(out[k], v)
            else:
                out[k] = v
        return out

    merged = merge(ref["params"], params)
    merged_stats = merge(ref["batch_stats"], batch_stats)
    ep = model.apply({"params": merged, "batch_stats": merged_stats},
                     pts, oh, train=False)
    assert np.isfinite(np.asarray(ep["center"])).all()


def test_missing_variables_fail_loudly(tmp_path):
    import tensorflow as tff
    ckpt = str(tmp_path / "bad.ckpt")
    with tff.Graph().as_default():
        tff.Variable(np.zeros((1, 1, 4, 64), np.float32),
                     name="conv1/weights")
        with tff.compat.v1.Session() as sess:
            sess.run(tff.compat.v1.global_variables_initializer())
            tff.compat.v1.train.Saver().save(sess, ckpt)
    with pytest.raises(KeyError, match="missing variables"):
        tf1_import.import_tf1_checkpoint(ckpt)
