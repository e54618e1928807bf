"""TF1-twin parity: v2 SA-MSG / FP conventions + v1 training mode.

VERDICT r02 item 4. Extends tests/test_tf1_parity.py (v1 eval graph) to
the two places SURVEY.md §7.3 flags as "silently shifts AP":

  (a) the PointNet++ `pointnet_util` conventions — centered grouping
      (group xyz minus centroid), MSG per-scale conv chains and the
      radii-order channel concat, and FP's 3-NN inverse-SQUARED-distance
      interpolation with [interpolated, skip] concat order — via
      tf.compat.v1 twins whose variables are written by a real
      `tf.compat.v1.train.Saver` and imported through
      utils/tf1_import.import_tf1_checkpoint (name_map-only mode);
  (b) TRAINING-mode semantics of the v1 seg stage — BatchNorm batch
      statistics (biased variance, eps 1e-3), the exponential
      moving-average running-stat update (shadow = decay * shadow +
      (1 - decay) * batch), and the gradient of the seg CE loss wrt
      every conv weight / bias / BN affine.

The grouping SELECTION itself (first-k in-radius by index, cyclic wrap)
is reproduced here with an independent numpy implementation, so drift in
ops/grouping would also surface.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from transferable3d_tpu.core import bins as bins_lib  # noqa: E402
from transferable3d_tpu.models.frustum_pointnet_v1 import (  # noqa: E402
    FrustumPointNetV1)
from transferable3d_tpu.models.pointnet2 import (  # noqa: E402
    FeaturePropagation, SetAbstractionMSG)
from transferable3d_tpu.ops.sampling import (  # noqa: E402
    farthest_point_sample, gather_points)
from transferable3d_tpu.utils import tf1_import  # noqa: E402

EPS = 1e-3

# SA-MSG twin configuration (small, CPU-friendly, f32 = unfused path).
B, N, CF = 2, 64, 2
S = 8
RADII = (0.5, 1.0)
NSAMPLES = (8, 16)
MLPS = ((16, 32), (16, 32))


def _bn_vars(rng, scope, cout, w):
    w[f"{scope}/bn/gamma"] = rng.normal(1.0, 0.05, cout).astype(np.float32)
    w[f"{scope}/bn/beta"] = rng.normal(0.0, 0.05, cout).astype(np.float32)
    w[f"{scope}/bn/moving_mean"] = rng.normal(0.0, 0.1, cout).astype(
        np.float32)
    w[f"{scope}/bn/moving_variance"] = (
        np.abs(rng.normal(1.0, 0.1, cout)) + 0.1).astype(np.float32)


def _conv_vars(rng, scope, cin, cout, w, bn=True):
    w[f"{scope}/weights"] = (rng.normal(size=(1, 1, cin, cout))
                             / np.sqrt(cin)).astype(np.float32)
    w[f"{scope}/biases"] = rng.normal(0.0, 0.05, cout).astype(np.float32)
    if bn:
        _bn_vars(rng, scope, cout, w)


def _tf_conv_bn_relu(x, v, scope, training=False):
    x = tf.nn.conv2d(x, v[f"{scope}/weights"], strides=[1, 1, 1, 1],
                     padding="VALID")
    x = tf.nn.bias_add(x, v[f"{scope}/biases"])
    gamma, beta = v[f"{scope}/bn/gamma"], v[f"{scope}/bn/beta"]
    if training:
        mean, var = tf.nn.moments(x, axes=[0, 1, 2])
    else:
        mean = v[f"{scope}/bn/moving_mean"]
        var = v[f"{scope}/bn/moving_variance"]
    x = (x - mean) * tf.math.rsqrt(var + EPS) * gamma + beta
    return tf.nn.relu(x), (mean, var)


def _group_first_k_numpy(xyz, centroids, radius, k):
    """Independent numpy ball-query: first-k in-radius by index, cyclic
    wrap past the count, nearest-point fallback for empty balls.
    Returns indices [B, S, K]."""
    b, s = centroids.shape[:2]
    idx = np.zeros((b, s, k), np.int64)
    for bi in range(b):
        d2 = ((centroids[bi][:, None] - xyz[bi][None]) ** 2).sum(-1)
        for si in range(s):
            hits = np.flatnonzero(d2[si] <= radius * radius)
            if len(hits) == 0:
                hits = np.array([int(np.argmin(d2[si]))])
            eff = min(len(hits), k)
            idx[bi, si] = hits[np.arange(k) % eff]
    return idx


@pytest.fixture(scope="module")
def sa_msg_setup(tmp_path_factory):
    rng = np.random.RandomState(3)
    xyz = rng.uniform(-1.5, 1.5, (B, N, 3)).astype(np.float32)
    feats = rng.normal(0, 1, (B, N, CF)).astype(np.float32)

    weights = {}
    name_map = {}
    for si, mlp in enumerate(MLPS):
        cin = 3 + CF
        for li, cout in enumerate(mlp):
            scope = f"layer1/conv{si}_{li}"
            _conv_vars(rng, scope, cin, cout, weights)
            name_map[f"mlp_{si}/dense_{li}"] = scope
            cin = cout

    # --- TF twin: centered grouping -> per-scale conv/bn/relu chain ->
    # max over K -> concat over scales in radii order.
    fps_idx = np.asarray(farthest_point_sample(jnp.asarray(xyz), S))
    centroids = np.take_along_axis(xyz, fps_idx[..., None], axis=1)

    g = tf.Graph()
    with g.as_default():
        v = {n: tf.constant(val) for n, val in weights.items()}
        outs = []
        for si, (r, k, mlp) in enumerate(zip(RADII, NSAMPLES, MLPS)):
            idx = _group_first_k_numpy(xyz, centroids, r, k)
            gxyz = np.take_along_axis(
                xyz[:, None], idx[..., None], axis=2)        # [B,S,K,3]
            gfeat = np.take_along_axis(
                feats[:, None], idx[..., None], axis=2)      # [B,S,K,CF]
            centered = gxyz - centroids[:, :, None, :]
            x = tf.constant(
                np.concatenate([centered, gfeat], -1).astype(np.float32))
            for li in range(len(mlp)):
                x, _ = _tf_conv_bn_relu(x, v, f"layer1/conv{si}_{li}")
            outs.append(tf.reduce_max(x, axis=2))            # [B, S, C]
        out = tf.concat(outs, axis=-1)
        with tf.compat.v1.Session(graph=g) as sess:
            tf_out = sess.run(out)
            # Real TF1 checkpoint round-trip for the importer.
            var_objs = {n: tf.Variable(val, name=n)
                        for n, val in weights.items()}
            sess.run(tf.compat.v1.variables_initializer(
                list(var_objs.values())))
            ckpt = tf.compat.v1.train.Saver(var_list=var_objs).save(
                sess, str(tmp_path_factory.mktemp("tf1v2") / "sa.ckpt"))

    params, batch_stats = tf1_import.import_tf1_checkpoint(
        ckpt, name_map=name_map, concat_conv=None, include_v1_map=False)
    return xyz, feats, centroids, tf_out, params, batch_stats


def test_sa_msg_parity(sa_msg_setup):
    """Our SetAbstractionMSG == the TF1 twin on checkpoint-imported
    weights: pins centered grouping, per-scale chains, BN placement,
    max-pool, and the radii-order concat."""
    xyz, feats, centroids, tf_out, params, batch_stats = sa_msg_setup
    mod = SetAbstractionMSG(npoint=S, radii=RADII, nsamples=NSAMPLES,
                            mlps=MLPS)
    new_xyz, out = mod.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(xyz), jnp.asarray(feats), train=False,
        bn_momentum=0.9)
    np.testing.assert_allclose(np.asarray(new_xyz), centroids, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out), tf_out, rtol=2e-4,
                               atol=2e-4)


@pytest.fixture(scope="module")
def fp_setup(tmp_path_factory):
    rng = np.random.RandomState(5)
    m, n_src, c_from, c_to = 48, 12, 5, 3
    xyz_to = rng.uniform(-1, 1, (B, m, 3)).astype(np.float32)
    xyz_from = rng.uniform(-1, 1, (B, n_src, 3)).astype(np.float32)
    # Exercise the coincident-point path: query 0 sits ON support 0.
    xyz_to[:, 0] = xyz_from[:, 0]
    feat_from = rng.normal(0, 1, (B, n_src, c_from)).astype(np.float32)
    feat_to = rng.normal(0, 1, (B, m, c_to)).astype(np.float32)

    weights, name_map = {}, {}
    cin = c_from + c_to
    fp_mlp = (16, 24)
    for li, cout in enumerate(fp_mlp):
        scope = f"fa_layer1/conv_{li}"
        _conv_vars(rng, scope, cin, cout, weights)
        name_map[f"mlp/dense_{li}"] = scope
        cin = cout

    # --- numpy 3-NN + reference IDW: SQUARED distances, floored at
    # 1e-10, weights (1/d) / sum(1/d) (pointnet_util.pointnet_fp_module
    # applies three_nn's squared outputs directly).
    interp = np.zeros((B, m, c_from), np.float32)
    for bi in range(B):
        d2 = ((xyz_to[bi][:, None] - xyz_from[bi][None]) ** 2).sum(-1)
        nn3 = np.argsort(d2, axis=1, kind="stable")[:, :3]
        d = np.maximum(np.take_along_axis(d2, nn3, axis=1), 1e-10)
        w = (1.0 / d) / (1.0 / d).sum(axis=1, keepdims=True)
        interp[bi] = (feat_from[bi][nn3] * w[..., None]).sum(axis=1)

    g = tf.Graph()
    with g.as_default():
        v = {nme: tf.constant(val) for nme, val in weights.items()}
        x = tf.constant(np.concatenate([interp, feat_to], -1)[:, :, None])
        for li in range(len(fp_mlp)):
            x, _ = _tf_conv_bn_relu(x, v, f"fa_layer1/conv_{li}")
        out = tf.squeeze(x, axis=2)
        with tf.compat.v1.Session(graph=g) as sess:
            tf_out = sess.run(out)
            var_objs = {nme: tf.Variable(val, name=nme)
                        for nme, val in weights.items()}
            sess.run(tf.compat.v1.variables_initializer(
                list(var_objs.values())))
            ckpt = tf.compat.v1.train.Saver(var_list=var_objs).save(
                sess, str(tmp_path_factory.mktemp("tf1fp") / "fp.ckpt"))

    params, batch_stats = tf1_import.import_tf1_checkpoint(
        ckpt, name_map=name_map, concat_conv=None, include_v1_map=False)
    return (xyz_to, xyz_from, feat_to, feat_from, fp_mlp, tf_out, params,
            batch_stats)


def test_fp_parity(fp_setup):
    """Our FeaturePropagation == the TF1 twin: pins the 3-NN selection,
    the inverse-squared-distance weights, the [interpolated, skip]
    concat order, and the conv chain."""
    (xyz_to, xyz_from, feat_to, feat_from, fp_mlp, tf_out, params,
     batch_stats) = fp_setup
    mod = FeaturePropagation(fp_mlp)
    out = mod.apply({"params": params, "batch_stats": batch_stats},
                    jnp.asarray(xyz_to), jnp.asarray(xyz_from),
                    jnp.asarray(feat_to), jnp.asarray(feat_from),
                    train=False, bn_momentum=0.9)
    np.testing.assert_allclose(np.asarray(out), tf_out, rtol=2e-4,
                               atol=2e-4)


# ---------------------------------------------------------------------------
# (a2) v2 TRAINING-mode SA-MSG twin (round-3 verdict item 8): grouped-BN
# batch statistics over [B, S, K], the EMA running-stat update, and the
# gradient of a scalar loss wrt every conv kernel / bias / BN affine —
# the last effort-addressable parity gap (v2 was eval-only).
# ---------------------------------------------------------------------------

SA_BN_DECAY = 0.75


@pytest.fixture(scope="module")
def sa_msg_train_setup(tmp_path_factory):
    rng = np.random.RandomState(11)
    xyz = rng.uniform(-1.5, 1.5, (B, N, 3)).astype(np.float32)
    feats = rng.normal(0, 1, (B, N, CF)).astype(np.float32)

    weights, name_map = {}, {}
    for si, mlp in enumerate(MLPS):
        cin = 3 + CF
        for li, cout in enumerate(mlp):
            scope = f"layer1t/conv{si}_{li}"
            _conv_vars(rng, scope, cin, cout, weights)
            name_map[f"mlp_{si}/dense_{li}"] = scope
            cin = cout
    g_out = rng.normal(0, 1, (B, S, sum(m[-1] for m in MLPS))).astype(
        np.float32)

    fps_idx = np.asarray(farthest_point_sample(jnp.asarray(xyz), S))
    centroids = np.take_along_axis(xyz, fps_idx[..., None], axis=1)

    g = tf.Graph()
    with g.as_default():
        v = {n: tf.Variable(val, name=n) for n, val in weights.items()}
        batch_moments = {}
        outs = []
        for si, (r, k, mlp) in enumerate(zip(RADII, NSAMPLES, MLPS)):
            idx = _group_first_k_numpy(xyz, centroids, r, k)
            gxyz = np.take_along_axis(
                xyz[:, None], idx[..., None], axis=2)
            gfeat = np.take_along_axis(
                feats[:, None], idx[..., None], axis=2)
            centered = gxyz - centroids[:, :, None, :]
            x = tf.constant(
                np.concatenate([centered, gfeat], -1).astype(np.float32))
            for li in range(len(mlp)):
                scope = f"layer1t/conv{si}_{li}"
                x, moments = _tf_conv_bn_relu(x, v, scope, training=True)
                batch_moments[scope] = moments
            outs.append(tf.reduce_max(x, axis=2))
        out = tf.concat(outs, axis=-1)
        loss = tf.reduce_sum(out * tf.constant(g_out))
        var_list = [var for name, var in v.items() if "moving" not in name]
        grads = tf.gradients(loss, var_list)
        with tf.compat.v1.Session(graph=g) as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            tf_out, tf_loss, tf_grads, tf_moments = sess.run(
                [out, loss, grads, batch_moments])
            ckpt = tf.compat.v1.train.Saver(var_list=v).save(
                sess, str(tmp_path_factory.mktemp("tf1v2t") / "sat.ckpt"))
    tf_grads = {var.name.split(":")[0]: g_
                for var, g_ in zip(var_list, tf_grads)}

    params, batch_stats = tf1_import.import_tf1_checkpoint(
        ckpt, name_map=name_map, concat_conv=None, include_v1_map=False)
    return (weights, xyz, feats, g_out, tf_out, tf_loss, tf_grads,
            tf_moments, params, batch_stats)


def test_sa_msg_train_mode_parity(sa_msg_train_setup):
    (weights, xyz, feats, g_out, tf_out, tf_loss, tf_grads, tf_moments,
     params, batch_stats) = sa_msg_train_setup
    mod = SetAbstractionMSG(npoint=S, radii=RADII, nsamples=NSAMPLES,
                            mlps=MLPS)

    def loss_fn(p):
        (new_xyz, out), upd = mod.apply(
            {"params": p, "batch_stats": batch_stats},
            jnp.asarray(xyz), jnp.asarray(feats), train=True,
            bn_momentum=SA_BN_DECAY, mutable=["batch_stats"])
        return jnp.sum(out * jnp.asarray(g_out)), (out, upd)

    (our_loss, (out, upd)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)

    # Forward parity in TRAIN mode: batch-stat BN over the grouped
    # [B, S, K] axes, including the cyclic-wrap pad slots.
    np.testing.assert_allclose(np.asarray(out), tf_out, rtol=3e-4,
                               atol=3e-4)
    np.testing.assert_allclose(float(our_loss), tf_loss, rtol=1e-4)

    # EMA running-stat update, per scale and layer.
    new_stats = upd["batch_stats"]
    checked = 0
    for si, mlp in enumerate(MLPS):
        for li in range(len(mlp)):
            scope = f"layer1t/conv{si}_{li}"
            node = new_stats[f"mlp_{si}"][f"bn_{li}"]
            want_mean = (SA_BN_DECAY * weights[f"{scope}/bn/moving_mean"]
                         + (1 - SA_BN_DECAY) * tf_moments[scope][0])
            want_var = (SA_BN_DECAY
                        * weights[f"{scope}/bn/moving_variance"]
                        + (1 - SA_BN_DECAY) * tf_moments[scope][1])
            np.testing.assert_allclose(np.asarray(node["mean"]),
                                       want_mean, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(node["var"]),
                                       want_var, rtol=1e-4, atol=1e-5)
            checked += 1
    assert checked == sum(len(m) for m in MLPS)

    # Gradient parity leaf by leaf. Cosine + max-relative like the v1
    # twin: the group max-pool can route near-tie gradients to a
    # different K row between TF(oneDNN) and XLA.
    def check(got, want, msg):
        got, want = np.asarray(got), np.asarray(want)
        cos = float((got * want).sum()
                    / (np.linalg.norm(got) * np.linalg.norm(want) + 1e-30))
        relmax = float(np.abs(got - want).max()
                       / (np.abs(want).max() + 1e-30))
        assert cos > 0.9999, (msg, cos)
        assert relmax < 2e-2, (msg, relmax)

    for si, mlp in enumerate(MLPS):
        for li in range(len(mlp)):
            scope = f"layer1t/conv{si}_{li}"
            node = grads[f"mlp_{si}"][f"dense_{li}"]
            gk = np.asarray(node["kernel"])
            check(gk, tf_grads[f"{scope}/weights"].reshape(gk.shape),
                  f"{scope} kernel grad")
            # Conv biases feed straight into BN: the mean subtraction
            # cancels them exactly — both sides' grads are ~zero. (Our
            # dense_0 bias additionally cancels between pf and qc in
            # the factored layer-1 path; same analytic zero.)
            assert np.abs(np.asarray(node["bias"])).max() < 1e-3, scope
            assert np.abs(tf_grads[f"{scope}/biases"]).max() < 1e-3
            bn = grads[f"mlp_{si}"][f"bn_{li}"]
            check(bn["scale"], tf_grads[f"{scope}/bn/gamma"],
                  f"{scope} gamma grad")
            check(bn["bias"], tf_grads[f"{scope}/bn/beta"],
                  f"{scope} beta grad")


# ---------------------------------------------------------------------------
# (b) v1 training-mode: BN running-stat updates + gradients.
# ---------------------------------------------------------------------------

CFG = bins_lib.SUNRGBD
K10 = CFG.num_classes
BT, NT, CT = 4, 96, 4
SEG_CONVS = [("conv1", CT, 64), ("conv2", 64, 64), ("conv3", 64, 64),
             ("conv4", 64, 128), ("conv5", 128, 1024),
             ("conv6", 64 + 1024 + K10, 512), ("conv7", 512, 256),
             ("conv8", 256, 128), ("conv9", 128, 128)]
SEG_MAP = {  # our param path -> TF scope (concat conv handled via split)
    "seg_net/mlp1/dense_0": "conv1", "seg_net/mlp1/dense_1": "conv2",
    "seg_net/mlp2/dense_0": "conv3", "seg_net/mlp2/dense_1": "conv4",
    "seg_net/mlp2/dense_2": "conv5",
    "seg_net/mlp3/dense_0": "conv7", "seg_net/mlp3/dense_1": "conv8",
    "seg_net/mlp3/dense_2": "conv9", "seg_net/seg_out": "conv10",
}
BN_DECAY = 0.8


@pytest.fixture(scope="module")
def train_mode_setup():
    rng = np.random.RandomState(9)
    weights = {}
    for scope, cin, cout in SEG_CONVS:
        _conv_vars(rng, scope, cin, cout, weights)
    w10 = (rng.normal(size=(1, 1, 128, 1)) / np.sqrt(128.0))
    weights["conv10/weights"] = np.concatenate([w10, -w10], 3).astype(
        np.float32)
    weights["conv10/biases"] = np.zeros((2,), np.float32)

    points = rng.normal(0.0, 1.5, (BT, NT, CT)).astype(np.float32)
    points[..., 2] += 10.0
    one_hot = np.eye(K10, dtype=np.float32)[[1, 4, 6, 8]]
    labels = rng.randint(0, 2, (BT, NT)).astype(np.int32)

    # --- TF twin: seg stage, TRAINING phase (batch-stat BN), seg CE
    # loss, gradients wrt every variable, EMA-updated running stats.
    g = tf.Graph()
    with g.as_default():
        v = {n: tf.Variable(val, name=n) for n, val in weights.items()}
        x = tf.constant(points)[:, :, None, :]
        batch_moments = {}

        def conv_bn_relu(x, scope):
            x = tf.nn.conv2d(x, v[f"{scope}/weights"],
                             strides=[1, 1, 1, 1], padding="VALID")
            x = tf.nn.bias_add(x, v[f"{scope}/biases"])
            mean, var = tf.nn.moments(x, axes=[0, 1, 2])
            batch_moments[scope] = (mean, var)
            x = ((x - mean) * tf.math.rsqrt(var + EPS)
                 * v[f"{scope}/bn/gamma"] + v[f"{scope}/bn/beta"])
            return tf.nn.relu(x)

        x = conv_bn_relu(x, "conv1")
        x = conv_bn_relu(x, "conv2")
        point_feat = x
        x = conv_bn_relu(x, "conv3")
        x = conv_bn_relu(x, "conv4")
        x = conv_bn_relu(x, "conv5")
        global_feat = tf.reduce_max(x, axis=1, keepdims=True)
        gcat = tf.concat([global_feat,
                          tf.reshape(tf.constant(one_hot),
                                     (BT, 1, 1, K10))], axis=3)
        x = tf.concat([point_feat, tf.tile(gcat, [1, NT, 1, 1])], axis=3)
        x = conv_bn_relu(x, "conv6")
        x = conv_bn_relu(x, "conv7")
        x = conv_bn_relu(x, "conv8")
        x = conv_bn_relu(x, "conv9")
        x = tf.nn.conv2d(x, v["conv10/weights"], strides=[1, 1, 1, 1],
                         padding="VALID")
        x = tf.nn.bias_add(x, v["conv10/biases"])
        seg_logits = tf.squeeze(x, axis=2)
        loss = tf.reduce_mean(
            tf.nn.sparse_softmax_cross_entropy_with_logits(
                labels=tf.constant(labels.astype(np.int64)),
                logits=seg_logits))
        # moving_mean/variance are unused in training phase -> grad None.
        var_list = [var for name, var in v.items() if "moving" not in name]
        grads = tf.gradients(loss, var_list)
        with tf.compat.v1.Session(graph=g) as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            (tf_loss, tf_grads, tf_moments, tf_logits) = sess.run(
                [loss, grads, batch_moments, seg_logits])
    tf_grads = {var.name.split(":")[0]: g_
                for var, g_ in zip(var_list, tf_grads)}
    return (weights, points, one_hot, labels, tf_loss, tf_grads,
            tf_moments, tf_logits)


def _our_params_from_tf(weights):
    """Build the flax seg-stage params/batch_stats from TF1-layout
    weights (same mapping logic as the importer; direct here since only
    the seg stage exists in the twin)."""
    params, batch_stats = {}, {}

    def put(tree, path, val):
        node = tree
        for kk in path[:-1]:
            node = node.setdefault(kk, {})
        node[path[-1]] = np.asarray(val, np.float32)

    for our, scope in SEG_MAP.items():
        path = our.split("/")
        put(params, path + ["kernel"],
            weights[f"{scope}/weights"].reshape(
                weights[f"{scope}/weights"].shape[2], -1))
        put(params, path + ["bias"], weights[f"{scope}/biases"])
        if f"{scope}/bn/gamma" in weights:
            bn = path[:-1] + [path[-1].replace("dense_", "bn_")]
            put(params, bn + ["scale"], weights[f"{scope}/bn/gamma"])
            put(params, bn + ["bias"], weights[f"{scope}/bn/beta"])
            put(batch_stats, bn + ["mean"],
                weights[f"{scope}/bn/moving_mean"])
            put(batch_stats, bn + ["var"],
                weights[f"{scope}/bn/moving_variance"])
    w6 = weights["conv6/weights"].reshape(64 + 1024 + K10, 512)
    put(params, ["seg_net", "mlp3_point", "kernel"], w6[:64])
    put(params, ["seg_net", "mlp3_global", "kernel"], w6[64:])
    put(params, ["seg_net", "mlp3_point", "bias"],
        weights["conv6/biases"])
    put(params, ["seg_net", "mlp3_bn", "scale"],
        weights["conv6/bn/gamma"])
    put(params, ["seg_net", "mlp3_bn", "bias"], weights["conv6/bn/beta"])
    put(batch_stats, ["seg_net", "mlp3_bn", "mean"],
        weights["conv6/bn/moving_mean"])
    put(batch_stats, ["seg_net", "mlp3_bn", "var"],
        weights["conv6/bn/moving_variance"])
    return params, batch_stats


def _full_v1_trees(weights, points, one_hot):
    """Seg-stage params from TF + freshly initialized tnet/box stages
    (zero-grad under a seg-only loss; needed for model.apply)."""
    model = FrustumPointNetV1(cfg=CFG, dropout_rate=0.0)
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(points), jnp.asarray(one_hot), train=False)
    params = jax.tree.map(np.asarray, variables["params"])
    batch_stats = jax.tree.map(np.asarray, variables["batch_stats"])
    seg_params, seg_stats = _our_params_from_tf(weights)

    def merge(dst, src):
        for k_, v_ in src.items():
            if isinstance(v_, dict):
                merge(dst[k_], v_)
            else:
                assert dst[k_].shape == v_.shape, (k_, dst[k_].shape,
                                                   v_.shape)
                dst[k_] = v_

    merge(params, seg_params)
    merge(batch_stats, seg_stats)
    return model, params, batch_stats


def test_v1_train_mode_parity(train_mode_setup):
    (weights, points, one_hot, labels, tf_loss, tf_grads, tf_moments,
     tf_logits) = train_mode_setup
    model, params, batch_stats = _full_v1_trees(weights, points, one_hot)

    def loss_fn(p):
        ep, upd = model.apply(
            {"params": p, "batch_stats": batch_stats},
            jnp.asarray(points), jnp.asarray(one_hot), train=True,
            bn_momentum=BN_DECAY, rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        logits = ep["seg_logits"].astype(jnp.float32)
        logz = jax.nn.logsumexp(logits, axis=-1)
        picked = jnp.take_along_axis(
            logits, jnp.asarray(labels)[..., None], axis=-1)[..., 0]
        return jnp.mean(logz - picked), (ep, upd)

    (our_loss, (ep, upd)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)

    # Forward parity in TRAIN mode (batch-stat BN).
    np.testing.assert_allclose(np.asarray(ep["seg_logits"]), tf_logits,
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(float(our_loss), tf_loss, rtol=1e-4)

    # Running-stat EMA update: shadow = decay*shadow + (1-decay)*batch.
    new_stats = upd["batch_stats"]
    checks = 0
    for our, scope in SEG_MAP.items():
        if f"{scope}/bn/gamma" not in weights:
            continue
        path = our.replace("dense_", "bn_").split("/")
        node = new_stats
        for k_ in path:
            node = node[k_]
        want_mean = (BN_DECAY * weights[f"{scope}/bn/moving_mean"]
                     + (1 - BN_DECAY) * tf_moments[scope][0])
        want_var = (BN_DECAY * weights[f"{scope}/bn/moving_variance"]
                    + (1 - BN_DECAY) * tf_moments[scope][1])
        np.testing.assert_allclose(np.asarray(node["mean"]), want_mean,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(node["var"]), want_var,
                                   rtol=1e-4, atol=1e-5)
        checks += 1
    assert checks == 8  # conv1..conv9 minus the split conv6

    # Gradient parity, leaf by leaf (kernels, biases, BN affine).
    # Tolerance is cosine + max-relative-to-leaf-scale, not elementwise:
    # the 9-layer stack amplifies f32 reassociation noise, and near-tie
    # global max-pools can route conv5's gradient to a different point
    # row between TF(oneDNN) and XLA. A semantic drift (wrong BN
    # backward, missing stat-correction terms) flips cosine well below
    # 0.999 — verified by mutation: dropping the mdy/mdyx terms in the
    # isolated check below gives errors >1e-2 at 384 rows. The isolated
    # single-BN test (test_bn_train_backward_exact) pins the backward
    # FORMULA at f32 round-off tolerance.
    def leaf(tree, path):
        node = tree
        for k_ in path:
            node = node[k_]
        return np.asarray(node)

    def check(got, want, msg):
        if np.abs(got).max() < 1e-6 and np.abs(want).max() < 1e-6:
            return  # both ~zero (e.g. post-pool shift grads): round-off
        cos = float((got * want).sum()
                    / (np.linalg.norm(got) * np.linalg.norm(want) + 1e-30))
        relmax = float(np.abs(got - want).max()
                       / (np.abs(want).max() + 1e-30))
        assert cos > 0.9999, (msg, cos)
        assert relmax < 2e-2, (msg, relmax)

    compared = 0
    for our, scope in SEG_MAP.items():
        path = our.split("/")
        gk = leaf(grads, path + ["kernel"])
        check(gk, tf_grads[f"{scope}/weights"].reshape(gk.shape),
              f"{scope}/weights grad")
        gb = leaf(grads, path + ["bias"])
        if f"{scope}/bn/gamma" in weights:
            # A bias feeding straight into BN is canceled exactly by the
            # mean subtraction: its gradient is analytically ZERO. Both
            # sides must agree on that (round-off only).
            assert np.abs(gb).max() < 1e-4, f"{scope}/biases grad"
            assert np.abs(tf_grads[f"{scope}/biases"]).max() < 1e-4
        else:
            check(gb, tf_grads[f"{scope}/biases"],
                  f"{scope}/biases grad")
        if f"{scope}/bn/gamma" in weights:
            bn = path[:-1] + [path[-1].replace("dense_", "bn_")]
            check(leaf(grads, bn + ["scale"]),
                  tf_grads[f"{scope}/bn/gamma"], f"{scope} gamma grad")
            check(leaf(grads, bn + ["bias"]),
                  tf_grads[f"{scope}/bn/beta"], f"{scope} beta grad")
        compared += 1

    # The factored concat conv: grads of the split halves vs conv6.
    g6 = tf_grads["conv6/weights"].reshape(64 + 1024 + K10, 512)
    check(leaf(grads, ["seg_net", "mlp3_point", "kernel"]), g6[:64],
          "conv6 point kernel grad")
    check(leaf(grads, ["seg_net", "mlp3_global", "kernel"]), g6[64:],
          "conv6 global kernel grad")
    # conv6's bias also feeds the (factored) BN: analytically zero.
    assert np.abs(leaf(grads, ["seg_net", "mlp3_point", "bias"])
                  ).max() < 1e-4
    assert np.abs(tf_grads["conv6/biases"]).max() < 1e-4
    assert compared == len(SEG_MAP)


def test_bn_train_backward_exact():
    """Isolated train-mode ScheduledBatchNorm vs TF batch-stat BN:
    forward, dgamma/dbeta, and dx (which carries the batch-statistic
    correction terms) at f32 round-off tolerance."""
    from transferable3d_tpu.models.layers import ScheduledBatchNorm

    rng = np.random.RandomState(0)
    bb, nn_, cc = 4, 96, 32
    x = rng.normal(1.5, 2.0, (bb, nn_, cc)).astype(np.float32)
    gamma = rng.normal(1, 0.1, cc).astype(np.float32)
    beta = rng.normal(0, 0.1, cc).astype(np.float32)
    g_out = rng.normal(0, 1, (bb, nn_, cc)).astype(np.float32)

    g = tf.Graph()
    with g.as_default():
        xv = tf.constant(x)
        gv = tf.Variable(gamma)
        bv = tf.Variable(beta)
        mean, var = tf.nn.moments(xv, axes=[0, 1])
        y = (xv - mean) * tf.math.rsqrt(var + EPS) * gv + bv
        loss = tf.reduce_sum(y * tf.constant(g_out))
        grads = tf.gradients(loss, [gv, bv, xv])
        with tf.compat.v1.Session(graph=g) as s:
            s.run(tf.compat.v1.global_variables_initializer())
            tf_y, (tf_dg, tf_db, tf_dx) = s.run([y, grads])

    mod = ScheduledBatchNorm(use_running_average=False)
    params = {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)}
    stats = {"mean": jnp.zeros(cc), "var": jnp.ones(cc)}

    def f(p, xx):
        y_, _ = mod.apply({"params": p, "batch_stats": stats}, xx, 0.9,
                          mutable=["batch_stats"])
        return jnp.sum(y_ * jnp.asarray(g_out)), y_

    (_, y_j), gr = jax.value_and_grad(f, argnums=(0, 1), has_aux=True)(
        params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_j), tf_y, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gr[0]["scale"]), tf_dg,
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gr[0]["bias"]), tf_db,
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gr[1]), tf_dx, rtol=1e-5,
                               atol=1e-5)
