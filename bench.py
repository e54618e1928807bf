"""Benchmark: supervised F-PointNet v1 training throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "train_frustums_per_sec", "value": N, "unit": "frustums/s",
   "vs_baseline": N / (10 * TF1_CPU_FPS_EST)}

North-star (BASELINE.json): >= 10x TF1-CPU frustums/sec at N=1024.
The reference published no throughput ("published": {}), so the baseline
constant below is an engineering estimate of the TF1-CPU reference:
F-PointNet v1 fwd+bwd is ~5.4 GFLOP/example at N=1024; a 2018-era
multicore CPU TF1 run sustains ~50 examples/s. vs_baseline therefore
measures progress against the 10x target (1.0 == target met).

Measures the production train step (loss + grads + Adam + BN stats, IoU
metrics off to isolate training compute) in steady state with batches
pre-staged on device; first-step compile excluded.
"""

from __future__ import annotations

import os
import sys

# Self-sufficient import: work without `pip install -e .` (fresh clones).
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import json
import sys
import time

import numpy as np

TF1_CPU_FPS_EST = 50.0
TARGET_MULTIPLE = 10.0

BATCH = 128
NPOINTS = 1024
CHANNELS = 4
INNER_STEPS = 20   # lax.scan inside one jit: removes host-dispatch jitter
OUTER_CALLS = 4    # jitter from the TPU relay (observed ~30% run noise)

# The axon relay's observed outage modes are (a) `jax.devices()` raising
# UNAVAILABLE, (b) hanging indefinitely at backend init (2026-08-17
# outage: probes hang until killed), and (c) device enumeration
# SUCCEEDING while every compile hangs (2026-08-21 outage). Bound an
# init + tiny compile so the driver's BENCH_rN.json records a
# structured outage line instead of `parsed:null` in all three modes
# (round-3 verdict item 7). The probe budget must cover a legitimate
# cold relay compile (observed 4 s–10 min for small programs).
BACKEND_PROBE_TIMEOUT_S = float(
    os.environ.get("T3D_BENCH_PROBE_TIMEOUT", "600"))


def probe_backend(timeout_s: float = BACKEND_PROBE_TIMEOUT_S,
                  _init_fn=None) -> str | None:
    """Initialize the jax backend and run one tiny compile, bounded.

    Returns None when healthy, else an error string. `_init_fn` is a
    test seam: the production init is `jax.devices()` plus a 128x128
    matmul round-trip in a daemon thread (the only way to bound a
    native-code hang without killing the process)."""
    import threading

    def _default_init():
        import jax
        import jax.numpy as jnp
        jax.devices()
        x = jnp.ones((128, 128))
        jax.block_until_ready(x @ x)

    result: dict = {}

    def _run():
        try:
            (_init_fn or _default_init)()
            result["ok"] = True
        except Exception as e:  # noqa: BLE001 - report any init failure
            result["error"] = f"{type(e).__name__}: {e}"

    t = threading.Thread(target=_run, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        result["hung"] = True
        return f"backend init hung > {timeout_s:.0f}s"
    return result.get("error")


def _metric_name(mode: str) -> str:
    if os.environ.get("T3D_E2E", "0") == "1":
        return "e2e_train_frustums_per_sec"
    return ("infer_frustums_per_sec" if mode == "infer"
            else "train_frustums_per_sec")


def emit_unavailable(mode: str, detail: str) -> str:
    """Print the structured backend-outage JSON line and return it."""
    line = json.dumps({
        "metric": _metric_name(mode),
        "value": None,
        "unit": "frustums/s",
        "vs_baseline": None,
        "error": "backend-unavailable",
        "detail": detail,
    })
    print(line, flush=True)
    return line


def main(mode: str = "train") -> int | None:
    err = probe_backend()
    if err is not None:
        emit_unavailable(mode, err)
        # A hung init leaves a daemon thread stuck in native code;
        # os._exit skips interpreter teardown that could itself hang.
        os._exit(0)
    import jax

    # Hardware RNG is ~3x cheaper than threefry for dropout mask bits on
    # TPU; counter-based determinism is not load-bearing for training.
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from transferable3d_tpu.core import bins as bins_lib
    from transferable3d_tpu.data import synthetic
    from transferable3d_tpu.data.provider import FrustumDataset
    from transferable3d_tpu.models.frustum_pointnet_v1 import FrustumPointNetV1
    from transferable3d_tpu.train import schedules, train_loop

    cfg = bins_lib.SUNRGBD
    # Small synthetic set, tiled to batch size on device (host is 1 core;
    # we are benchmarking the chip, not the host generator).
    recs = synthetic.make_dataset(32, cfg, seed=0, n_object=600,
                                  n_clutter=300)
    ds = FrustumDataset(recs, cfg, npoints=NPOINTS, rotate_to_center=True)
    small = ds.get_batch(list(range(32)))
    reps = BATCH // 32
    batch = {k: np.concatenate([v] * reps, axis=0) for k, v in small.items()}
    batch = jax.device_put(batch)

    if os.environ.get("T3D_MODEL", "v1") == "v2":
        from transferable3d_tpu.models.frustum_pointnet_v2 import (
            FrustumPointNetV2)
        model = FrustumPointNetV2(cfg=cfg, dtype=jnp.bfloat16)
    else:
        model = FrustumPointNetV1(cfg=cfg, dtype=jnp.bfloat16)
    lr_sched = schedules.exponential_staircase_lr(batch_size=BATCH)
    bn_sched = schedules.bn_momentum_schedule(batch_size=BATCH)
    tx = train_loop.make_optimizer(lr_sched)
    state = train_loop.create_train_state(model, cfg, tx, batch, seed=0)

    if mode == "infer":
        # Serving path: compiled predict step (forward + box decode).
        predict = train_loop.make_predict_step(model, cfg)

        def multi_infer(state, batch):
            def body(_, i):
                out = predict(state, batch)
                return 0, out["center"][0, 0]
            return jax.lax.scan(body, 0, None, length=INNER_STEPS)

        multi_infer = jax.jit(multi_infer)
        _, out = multi_infer(state, batch)
        jax.block_until_ready(out)
        times = []
        for _ in range(OUTER_CALLS):
            t0 = time.perf_counter()
            _, out = multi_infer(state, batch)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        fps = BATCH * INNER_STEPS / min(times)
        print(json.dumps({
            "metric": "infer_frustums_per_sec",
            "value": round(fps, 1),
            "unit": "frustums/s",
            "vs_baseline": round(fps / (TARGET_MULTIPLE * TF1_CPU_FPS_EST),
                                 3),
        }))
        return

    if os.environ.get("T3D_E2E", "0") == "1":
        # End-to-end mode (round-1 verdict item 6): raw depth maps ->
        # on-device frustum extraction (lift, crop, sample, rotate, bin
        # encode — data/depth_pipeline.scene_to_train_batch) -> train
        # step, all inside ONE jit region. Measures the "fused
        # preprocessing" claim as a number instead of a smoke test.
        from transferable3d_tpu.data import depth_pipeline

        frames, mb = BATCH // 4, 4
        scene, _ = depth_pipeline.make_depth_scene(
            np.random.RandomState(0), cfg, n_frames=frames,
            boxes_per_frame=mb, h=96, w=128)
        scene = jax.device_put(scene)
        # Depth-lifted points are 3-channel (xyz, no intensity): re-init
        # the state from an example end-to-end batch.
        eb0 = depth_pipeline.scene_to_train_batch(
            scene, jax.random.PRNGKey(1), NPOINTS, cfg)
        state = train_loop.create_train_state(model, cfg, tx, eb0, seed=0)
        step = train_loop.make_train_step(
            model, cfg, tx, lr_sched, bn_sched,
            step_cfg=train_loop.StepConfig(
                compute_iou_metrics=False, use_valid_weights=True))

        def multi_e2e(state, scene, rng):
            def body(carry, _):
                state, rng = carry
                rng, r = jax.random.split(rng)
                eb = depth_pipeline.scene_to_train_batch(
                    scene, r, NPOINTS, cfg)
                state, metrics = step(state, eb)
                return (state, rng), metrics["total_loss"]
            (state, rng), losses = jax.lax.scan(
                body, (state, rng), None, length=INNER_STEPS)
            return state, losses

        multi_e2e = jax.jit(multi_e2e, donate_argnums=(0,))
        rng = jax.random.PRNGKey(0)
        state, losses = multi_e2e(state, scene, rng)
        jax.block_until_ready(losses)
        times = []
        for _ in range(OUTER_CALLS):
            t0 = time.perf_counter()
            state, losses = multi_e2e(state, scene, rng)
            jax.block_until_ready(losses)
            times.append(time.perf_counter() - t0)
        fps = BATCH * INNER_STEPS / min(times)
        loss = float(losses[-1])
        assert np.isfinite(loss), f"non-finite loss {loss}"
        print(json.dumps({
            "metric": "e2e_train_frustums_per_sec",
            "value": round(fps, 1),
            "unit": "frustums/s",
            "vs_baseline": round(fps / (TARGET_MULTIPLE * TF1_CPU_FPS_EST),
                                 3),
        }))
        return

    # IoU metrics stay ON: the vectorized polygon clip made them free
    # (measured 16.15 ms with vs 16.16 ms without on v5e).
    step = train_loop.make_train_step(model, cfg, tx, lr_sched, bn_sched)

    # Multi-step scan in one jit: per-step python dispatch goes through
    # the TPU relay and adds ~30% run-to-run noise; scanning INNER_STEPS
    # on device measures the actual training throughput.
    def multi(state, batch):
        def body(s, _):
            s, metrics = step(s, batch)  # jit-in-jit traces inline
            return s, metrics["total_loss"]
        return jax.lax.scan(body, state, None, length=INNER_STEPS)

    multi = jax.jit(multi, donate_argnums=(0,))
    state, losses = multi(state, batch)  # compile + warmup
    jax.block_until_ready(losses)

    times = []
    for _ in range(OUTER_CALLS):
        t0 = time.perf_counter()
        state, losses = multi(state, batch)
        jax.block_until_ready(losses)
        times.append(time.perf_counter() - t0)
    dt = min(times)

    metrics = {"total_loss": losses[-1]}
    fps = BATCH * INNER_STEPS / dt
    loss = float(metrics["total_loss"])
    assert np.isfinite(loss), f"non-finite loss {loss}"
    print(json.dumps({
        "metric": "train_frustums_per_sec",
        "value": round(fps, 1),
        "unit": "frustums/s",
        "vs_baseline": round(fps / (TARGET_MULTIPLE * TF1_CPU_FPS_EST), 3),
    }))


def run_all() -> None:
    """Run all five benchmark modes, each in a fresh subprocess, and
    write the results to bench_all.json (VERDICT r02 item 5: every
    README performance number must be a driver-auditable artifact)."""
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    modes = [
        ("v1_train", [], {}),
        ("v1_infer", ["--infer"], {}),
        ("v2_train", [], {"T3D_MODEL": "v2"}),
        ("v2_infer", ["--infer"], {"T3D_MODEL": "v2"}),
        ("e2e_train", [], {"T3D_E2E": "1"}),
    ]
    results = {}
    for name, argv, env_extra in modes:
        env = dict(os.environ, **env_extra)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(here, "bench.py")] + argv,
                env=env, capture_output=True, text=True, timeout=1800)
        except subprocess.TimeoutExpired:
            # One hung mode (relay outage mid-run) must not lose the
            # whole artifact — record it and keep going.
            results[name] = {"error": "timeout after 1800s"}
            print(name, "->", results[name], flush=True)
            continue
        line = [l for l in proc.stdout.strip().splitlines()
                if l.startswith("{")]
        if proc.returncode != 0 or not line:
            results[name] = {"error": proc.stderr[-2000:]}
        else:
            results[name] = json.loads(line[-1])
        print(name, "->", results.get(name), flush=True)
    out_path = os.path.join(here, "bench_all.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    if "--all" in sys.argv:
        sys.exit(run_all())
    sys.exit(main("infer" if "--infer" in sys.argv else "train"))
