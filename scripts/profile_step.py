"""Profile one compiled train step on the TPU and print an op cost table.

Usage:
  python scripts/profile_step.py [v1|v2] [--infer]
  python scripts/profile_step.py e2e        # depth->frustum->train jit

Parses the xplane proto directly (the tensorboard-profile plugin
converters are broken in this image, per CLAUDE.md): aggregates the
"XLA Ops" line for exclusive times, ignoring %while wrappers and async
markers, and groups ops by a coarse category so the table maps back to
model stages.
"""

from __future__ import annotations

import collections
import glob
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 128
NPOINTS = 1024


def capture(model_name: str, mode: str) -> str:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_default_prng_impl", "rbg")

    from transferable3d_tpu.core import bins as bins_lib
    from transferable3d_tpu.data import synthetic
    from transferable3d_tpu.data.provider import FrustumDataset
    from transferable3d_tpu.train import schedules, train_loop

    cfg = bins_lib.SUNRGBD
    recs = synthetic.make_dataset(32, cfg, seed=0, n_object=600,
                                  n_clutter=300)
    ds = FrustumDataset(recs, cfg, npoints=NPOINTS, rotate_to_center=True)
    small = ds.get_batch(list(range(32)))
    batch = {k: np.concatenate([v] * (BATCH // 32), axis=0)
             for k, v in small.items()}
    batch = jax.device_put(batch)

    if model_name == "v2":
        from transferable3d_tpu.models.frustum_pointnet_v2 import (
            FrustumPointNetV2)
        model = FrustumPointNetV2(cfg=cfg, dtype=jnp.bfloat16)
    else:
        from transferable3d_tpu.models.frustum_pointnet_v1 import (
            FrustumPointNetV1)
        model = FrustumPointNetV1(cfg=cfg, dtype=jnp.bfloat16)

    lr_sched = schedules.exponential_staircase_lr(batch_size=BATCH)
    bn_sched = schedules.bn_momentum_schedule(batch_size=BATCH)
    tx = train_loop.make_optimizer(lr_sched)
    state = train_loop.create_train_state(model, cfg, tx, batch, seed=0)

    if mode == "e2e":
        # Mirrors bench.py's T3D_E2E=1 region (depth maps -> on-device
        # frustum extraction -> train step in one jit) so the e2e gap
        # to the 11,600 f/s bar can be attributed per-op.
        from transferable3d_tpu.data import depth_pipeline

        frames, mb = BATCH // 4, 4
        scene, _ = depth_pipeline.make_depth_scene(
            np.random.RandomState(0), cfg, n_frames=frames,
            boxes_per_frame=mb, h=96, w=128)
        scene = jax.device_put(scene)
        eb0 = depth_pipeline.scene_to_train_batch(
            scene, jax.random.PRNGKey(1), NPOINTS, cfg)
        state = train_loop.create_train_state(model, cfg, tx, eb0, seed=0)
        step = train_loop.make_train_step(
            model, cfg, tx, lr_sched, bn_sched,
            step_cfg=train_loop.StepConfig(
                compute_iou_metrics=False, use_valid_weights=True))

        @jax.jit
        def e2e_step(state, scene, rng):
            rng, r = jax.random.split(rng)
            eb = depth_pipeline.scene_to_train_batch(
                scene, r, NPOINTS, cfg)
            state, metrics = step(state, eb)
            return state, rng, metrics["total_loss"]

        rng = jax.random.PRNGKey(0)
        state, rng, loss = e2e_step(state, scene, rng)
        jax.block_until_ready(loss)
        trace_dir = tempfile.mkdtemp(prefix="t3d_prof_")
        jax.profiler.start_trace(trace_dir)
        for _ in range(3):
            state, rng, loss = e2e_step(state, scene, rng)
        jax.block_until_ready(loss)
        jax.profiler.stop_trace()
        return trace_dir

    if mode == "infer":
        step = train_loop.make_predict_step(model, cfg)
        out = step(state, batch)
        jax.block_until_ready(out)
        trace_dir = tempfile.mkdtemp(prefix="t3d_prof_")
        jax.profiler.start_trace(trace_dir)
        for _ in range(3):
            out = step(state, batch)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        return trace_dir

    step = train_loop.make_train_step(model, cfg, tx, lr_sched, bn_sched)
    state, metrics = step(state, batch)  # compile
    jax.block_until_ready(metrics["total_loss"])
    trace_dir = tempfile.mkdtemp(prefix="t3d_prof_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics["total_loss"])
    jax.profiler.stop_trace()
    return trace_dir


CATEGORIES = [
    ("fusion", re.compile(r"^(loop_)?fusion")),
    ("convolution/dot", re.compile(r"^(loop_)?(convolution|dot)")),
    ("custom-call(pallas)", re.compile(r"^custom-call")),
    ("sort", re.compile(r"^sort")),
    ("scatter", re.compile(r"^(loop_)?(scatter|select-and-scatter)")),
    ("gather", re.compile(r"^(loop_)?(gather|dynamic-slice)")),
    ("dynamic-update", re.compile(r"^(loop_)?dynamic-update-slice")),
    ("copy/transpose", re.compile(r"^(copy|transpose|bitcast|reshape)")),
    ("reduce", re.compile(r"^(loop_)?(reduce|all-reduce)")),
    ("rng", re.compile(r"^rng")),
]


def parse(trace_dir: str, top: int = 40) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True)
    assert files, f"no xplane in {trace_dir}"
    xs = xplane_pb2.XSpace()
    with open(files[0], "rb") as f:
        xs.ParseFromString(f.read())

    per_op = collections.Counter()       # name -> exclusive ps
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            # Collect events per line, compute exclusive = dur - children.
            evs = []
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, "?")
                evs.append((ev.offset_ps, ev.offset_ps + ev.duration_ps,
                            name))
            evs.sort()
            # exclusive time: subtract nested intervals (stack sweep).
            stack = []
            for start, end, name in evs:
                while stack and stack[-1][1] <= start:
                    s, e, n, child = stack.pop()
                    per_op[n] += (e - s) - child
                    if stack:
                        stack[-1] = (stack[-1][0], stack[-1][1],
                                     stack[-1][2], stack[-1][3] + (e - s))
                stack.append((start, end, name, 0))
            while stack:
                s, e, n, child = stack.pop()
                per_op[n] += (e - s) - child
                if stack:
                    stack[-1] = (stack[-1][0], stack[-1][1], stack[-1][2],
                                 stack[-1][3] + (e - s))

    # Drop control wrappers.
    per_op = collections.Counter(
        {n: v for n, v in per_op.items()
         if not n.startswith("%while") and "async" not in n})

    total = sum(per_op.values())
    print(f"\ntotal exclusive device time: {total/1e9:.3f} ms "
          f"(over 3 steps => {total/3e9:.3f} ms/step)")

    by_cat = collections.Counter()
    for name, v in per_op.items():
        base = name.split(".")[0].lstrip("%")
        for cat, pat in CATEGORIES:
            if pat.match(base):
                by_cat[cat] += v
                break
        else:
            by_cat["other:" + base] += v
    print("\n-- by category --")
    for cat, v in by_cat.most_common(20):
        print(f"{v/3e9:9.3f} ms/step  {100*v/total:5.1f}%  {cat}")

    print(f"\n-- top {top} ops --")
    for name, v in per_op.most_common(top):
        print(f"{v/3e9:9.3f} ms/step  {100*v/total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    model_name = "v2" if "v2" in sys.argv else "v1"
    mode = ("e2e" if "e2e" in sys.argv
            else "infer" if "--infer" in sys.argv else "train")
    if "--parse-only" in sys.argv:
        trace_dir = sys.argv[-1]
    else:
        trace_dir = capture(model_name, mode)
        print(f"trace: {trace_dir}")
    parse(trace_dir)
