"""Transfer-effect study: seeds x ablations of the weak-class losses.

Round-1 verdict item 3: "make the transfer effect undeniable" — run the
semi-supervised driver on the HARD synthetic distribution (surface-only
depth-sensor clouds, class-conditional partial shapes, occlusion) with
>= 3 seeds for each variant:

  transfer   — all four weak losses (fit / refine / reproj / size prior)
  control    — weak_weight = 0 (strong classes only; no weak supervision)
  no_fit / no_refine / no_reproj / no_prior — leave-one-out ablations

and report mean +/- std of weak-class mAP@0.25 (full inference -> VOC AP
pipeline, not the in-graph IoU proxy).

Usage:  python scripts/transfer_study.py [--seeds 3] [--epochs 60]
Writes results to transfer_study.json and prints a table.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def run_one(variant: str, seed: int, args) -> dict:
    import jax.numpy as jnp

    from transferable3d_tpu.eval import ap as ap_lib
    from transferable3d_tpu.models import registry
    from transferable3d_tpu.train import schedules, train_loop
    from transferable3d_tpu.train import test as test_lib
    from transferable3d_tpu.train import train_semisup
    from transferable3d_tpu.utils.checkpoint import CheckpointManager

    # (fit, refine, reproj, size_prior, size_cls, trust_gate)
    weights = {"transfer": (1, 1, 1, 0.5, 0, True),
               "control": (1, 1, 1, 0.5, 0, True),
               "no_trust": (1, 1, 1, 0.5, 0, False),
               "no_fit": (0, 1, 1, 0.5, 0, True),
               "no_refine": (1, 0, 1, 0.5, 0, True),
               "no_reproj": (1, 1, 0, 0.5, 0, True),
               "no_prior": (1, 1, 1, 0, 0, True),
               "with_sizecls": (1, 1, 1, 0.5, 1, True)}
    wf, wr, wp, ws, wsc, trust = weights[variant]
    log_dir = os.path.join(args.out_dir, f"{variant}_s{seed}")
    cfg = train_semisup.SemisupConfig(
        model=args.model, num_point=args.num_point,
        per_class_diag=args.diag,
        num_channels=4, batch_size=args.batch_size,
        max_epoch=args.epochs, boxpc_epochs=args.boxpc_epochs,
        synthetic_train=args.train_size, synthetic_val=args.val_size,
        synthetic_hard=True, compute_dtype="bfloat16",
        device_data=True, max_points_device=1024,
        log_dir=log_dir, seed=seed,
        eval_every_epochs=20, ckpt_every_epochs=20,
        weak_weight=0.0 if variant == "control" else args.weak_weight,
        weak_warmup_steps=args.weak_warmup_steps,
        weak_fit=wf, weak_refine=wr, weak_reproj=wp, weak_size_prior=ws,
        weak_size_cls=wsc, weak_trust_gate=trust,
        boxpc_aniso_aug=args.boxpc_aniso_aug)

    t0 = time.time()
    train_semisup.train(cfg)
    train_s = time.time() - t0

    # Weak-class mAP@0.25 through the full inference + VOC AP pipeline.
    bins_cfg = cfg.bin_config()
    _, _, weak_val = train_semisup.build_semisup_datasets(cfg)
    detector = registry.get_model(cfg.model, bins_cfg, dtype=jnp.bfloat16)
    lr = schedules.exponential_staircase_lr(batch_size=cfg.batch_size)
    tx = train_loop.make_optimizer(lr)
    sample = weak_val.get_batch(
        list(range(min(cfg.batch_size, len(weak_val)))))
    template = train_loop.create_train_state(detector, bins_cfg, tx, sample)
    ckpt = CheckpointManager(f"{cfg.log_dir}/ckpt")
    state = ckpt.restore_latest(template)
    ckpt.close()
    assert state is not None, f"no ckpt in {cfg.log_dir}"
    dets = test_lib.run_inference(detector, state, weak_val, bins_cfg,
                                  cfg.batch_size)
    aps = ap_lib.eval_det(test_lib.detections_to_eval_boxes(dets),
                          test_lib.groundtruth_boxes(weak_val, bins_cfg),
                          iou_thresh=0.25)
    return {"variant": variant, "seed": seed, "model": cfg.model,
            "mAP": aps["mAP"],
            "per_class": {k: v for k, v in aps.items() if k != "mAP"},
            "train_seconds": round(train_s, 1)}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--boxpc_epochs", type=int, default=40)
    p.add_argument("--train_size", type=int, default=2048)
    p.add_argument("--val_size", type=int, default=512)
    p.add_argument("--num_point", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--model", default="frustum_pointnets_v1",
                   help="detector registry name (round-4: the v2 study"
                        " — verdict item 6 — runs with"
                        " frustum_pointnets_v2)")
    p.add_argument("--diag", action="store_true",
                   help="log per-class trust-gate/loss diagnostics to"
                        " the run's metrics_train.csv (verdict item 9)")
    p.add_argument("--weak_weight", type=float, default=1.0)
    p.add_argument("--boxpc_aniso_aug", type=float, default=0.8,
                   help="phase-A joint cloud+box anisotropic rescale "
                        "log-range (0 disables; bookshelf fix A/B)")
    p.add_argument("--weak_warmup_steps", type=int, default=0)
    p.add_argument("--variants", default="transfer,control,no_fit,"
                                         "no_refine,no_reproj,no_prior")
    p.add_argument("--seed_list", default=None,
                   help="comma-separated explicit seeds (overrides"
                        " --seeds), e.g. the bookshelf-floor seeds 4,5"
                        " plus healthy contrast 7 for the diag runs")
    p.add_argument("--out_dir", default="/tmp/transfer_study")
    p.add_argument("--out_json", default="transfer_study.json")
    args = p.parse_args()

    jax.config.update("jax_default_prng_impl", "rbg")
    results = []
    if os.path.exists(args.out_json):  # resume
        results = json.load(open(args.out_json))
    done = {(r["variant"], r["seed"]) for r in results}
    seeds = ([int(s) for s in args.seed_list.split(",")]
             if args.seed_list else list(range(args.seeds)))
    # Seed-major so an interrupted unattended run leaves a BALANCED
    # partial artifact (every finished seed has all its variants).
    for seed in seeds:
        for variant in args.variants.split(","):
            if (variant, seed) in done:
                continue
            r = run_one(variant, seed, args)
            results.append(r)
            json.dump(results, open(args.out_json, "w"), indent=1)
            print(f"[{variant} seed {seed}] mAP@0.25 = {r['mAP']:.4f} "
                  f"({r['train_seconds']}s)", flush=True)

    print("\n== summary (weak-class mAP@0.25, mean +/- std) ==")
    by_var = {}
    for r in results:
        by_var.setdefault(r["variant"], []).append(r["mAP"])
    ctl = by_var.get("control", [0])
    base = np.mean(ctl)
    for v, xs in sorted(by_var.items()):
        line = (f"{v:10s} {np.mean(xs):.4f} +/- {np.std(xs):.4f}  "
                f"(delta vs control: {np.mean(xs) - base:+.4f}, "
                f"n={len(xs)}")
        if v != "control" and len(xs) >= 3 and len(ctl) >= 3:
            try:
                from scipy.stats import mannwhitneyu
                p_val = mannwhitneyu(xs, ctl,
                                     alternative="greater").pvalue
                line += f", U-test p={p_val:.3f}"
            except Exception:
                pass
        print(line + ")")


if __name__ == "__main__":
    main()
