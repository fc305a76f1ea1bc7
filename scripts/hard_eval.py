"""Hard-eval loop: train (optionally) + evaluate the detector on the
de-saturated corpus (pipeline/hardeval.py) and write the gate artifact.

The flagship accuracy gate saturated at mAP50 = 1.0 on the easy synthetic
scenes (VERDICT r3 weak #2) — it could not see gradual regressions. This
script produces docs/ACCURACY_HARD_EVAL.json: per-axis mAP50 on scenes
with distractors, occlusion, oblique viewing, confusable colors, and depth
noise, tuned so the number sits BELOW ceiling and each axis moves it.
bench_e2e.check_hard_eval_report() regression-gates the committed artifact.

Usage:
    # evaluate the committed fixture checkpoints (CPU ok, ~2 min)
    PYTHONPATH=. python scripts/hard_eval.py

    # retrain the toy fixture checkpoints on the widened corpus first
    # (TPU recommended), then evaluate; optionally refresh tests/fixtures
    PYTHONPATH=. python scripts/hard_eval.py --train [--update-fixtures]

    # full production scale (YOLOv10-n @ 640) — trains on TPU, ~15 min
    PYTHONPATH=. python scripts/hard_eval.py --train --full-scale

Training corpus (--train): THREE scans of the same scene class with
different trajectories/frame counts plus in-jit augmentation (flip, color
jitter, crop-zoom — ops/augment.py), so the detector learns the signs
rather than the five exact training viewpoints the old single-scan recipe
overfit to (its base-axis mAP50 off the training trajectory was ~0.67).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(REPO, "tests", "fixtures")


def train_checkpoints(out_dir: str, img_size: int, nc: int, steps: int,
                      beit_steps: int, full_scale: bool):
    """Multi-trajectory augmented finetune → (yolo_ckpt, beit_ckpt)."""
    import numpy as np

    from tpu3dlm.data import synthetic
    from tpu3dlm.data.dataset import load_scan
    from tpu3dlm.data.synthetic import load_scene_gt
    from tpu3dlm.models.beit import BeitConfig
    from tpu3dlm.models.weights import save_flax_checkpoint
    from tpu3dlm.pipeline.evaluate import BEIT_KW, FULL_BEIT_KW
    from tpu3dlm.pipeline.selftrain import (
        beit_training_crops,
        finetune_beit,
        finetune_yolo,
        yolo_training_arrays,
    )

    from tpu3dlm.pipeline.hardeval import confusable_signs

    root = tempfile.mkdtemp(prefix="tpu3dlm_hard_train_")
    # four trajectories over the same scene class: the default sweep, a
    # wider oblique sweep, a shifted closer pass, and a MILDLY desaturated
    # variant (strength 0.3 — the detector otherwise learns a hard color
    # cliff and the confusable axis reads 0.0 instead of degrading) —
    # augmentation handles the rest of the photometric variation, the
    # trajectories the viewpoint variation. Evaluation scans use a
    # DIFFERENT frame count (run_hard_eval num_frames=7), so the eval
    # viewpoints are never the training viewpoints.
    specs = [
        dict(num_frames=6, seed=0),
        dict(num_frames=8, seed=3, yaw_amplitude=0.25, x_span=(-1.0, 2.1)),
        dict(num_frames=6, seed=5, x_span=(-0.2, 1.2)),
        dict(num_frames=6, seed=9, signs=confusable_signs(0.3)),
    ]
    arrays = []
    crops_all, dmg_all = [], []
    beit_kw = FULL_BEIT_KW if full_scale else BEIT_KW
    for i, spec in enumerate(specs):
        folder = f"train_{i}"
        synthetic.generate_scan(root, folder, cloud_points_per_m2=800, **spec)
        base = os.path.join(root, folder, "rtabmap_extract")
        scan = load_scan(
            image_dir=os.path.join(base, "data_rgb"),
            depth_image_dir=os.path.join(base, "data_depth"),
            calibration_dir=os.path.join(base, "calibration"),
            pose_path=os.path.join(root, folder, "poses.txt"),
            img_size=img_size,
        )
        gt = load_scene_gt(os.path.join(root, folder, "gt.json"))
        arrays.append(yolo_training_arrays(gt["gt_boxes_2d"], scan))
        c, d = beit_training_crops(
            gt["gt_boxes_2d"], gt["gt_damage_2d"], scan, beit_kw["image_size"]
        )
        crops_all.append(c)
        dmg_all.append(d)

    images, boxes, labels, mask = (
        np.concatenate([a[k] for a in arrays]) for k in range(4)
    )
    logging.info("training corpus: %d frames, %d gt boxes",
                 images.shape[0], int(mask.sum()))
    yolo_vars = finetune_yolo(
        images, boxes, labels, mask, nc=nc, img_size=img_size,
        steps=steps, augment=True,
    )
    beit_cfg = BeitConfig(num_labels=2, **{k: v for k, v in beit_kw.items()
                                           if k != "num_labels"})
    beit_params = finetune_beit(
        np.concatenate(crops_all), np.concatenate(dmg_all), beit_cfg,
        steps=beit_steps,
    )
    os.makedirs(out_dir, exist_ok=True)
    suffix = "_full" if full_scale else ""
    yolo_path = os.path.join(out_dir, f"yolo_hard{suffix}.msgpack")
    beit_path = os.path.join(out_dir, f"beit_hard{suffix}.msgpack")
    save_flax_checkpoint(yolo_path, yolo_vars)
    save_flax_checkpoint(beit_path, beit_params)
    return yolo_path, beit_path


def main():
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--train", action="store_true",
                    help="retrain checkpoints on the widened corpus first")
    ap.add_argument("--full-scale", action="store_true",
                    help="YOLOv10-n @ 640 (TPU recommended)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--beit-steps", type=int, default=None)
    ap.add_argument("--yolo-ckpt", default=None,
                    help="evaluate this checkpoint instead of training/fixtures")
    ap.add_argument("--out", default=os.path.join(REPO, "docs",
                                                  "ACCURACY_HARD_EVAL.json"))
    ap.add_argument("--out-dir", default=os.path.join(
        tempfile.gettempdir(), "tpu3dlm_hard_ckpt"))
    ap.add_argument("--update-fixtures", action="store_true",
                    help="copy the trained toy checkpoints over "
                         "tests/fixtures/{yolo,beit}_synthetic.msgpack")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tpu3dlm.utils.backend import enable_compile_cache

    enable_compile_cache()

    import jax

    img_size = 640 if args.full_scale else 128
    nc = 2
    steps = args.steps or (1500 if args.full_scale else 600)
    beit_steps = args.beit_steps or (120 if args.full_scale else 80)

    t0 = time.time()
    if args.yolo_ckpt:
        yolo_ckpt = args.yolo_ckpt
    elif args.train:
        yolo_ckpt, beit_ckpt = train_checkpoints(
            args.out_dir, img_size, nc, steps, beit_steps, args.full_scale
        )
        if args.update_fixtures and not args.full_scale:
            import shutil

            shutil.copy(yolo_ckpt, os.path.join(FIXTURES, "yolo_synthetic.msgpack"))
            shutil.copy(beit_ckpt, os.path.join(FIXTURES, "beit_synthetic.msgpack"))
            logging.info("fixtures updated in %s", FIXTURES)
    else:
        yolo_ckpt = os.path.join(FIXTURES, "yolo_synthetic.msgpack")
    train_s = time.time() - t0

    from tpu3dlm.pipeline.hardeval import run_hard_eval, write_report

    t0 = time.time()
    report = run_hard_eval(
        yolo_ckpt, tempfile.mkdtemp(prefix="tpu3dlm_hard_eval_"),
        img_size=img_size, nc=nc, conf=0.5,
    )
    report.update(
        metric="detector_hard_eval",
        hardware=str(jax.devices()[0].device_kind
                     if jax.devices() else "unknown"),
        date=time.strftime("%Y-%m-%d"),
        checkpoint=os.path.basename(yolo_ckpt),
        scale="full" if args.full_scale else "fixture",
        training_seconds=round(train_s, 1),
        eval_seconds=round(time.time() - t0, 1),
        # the regression band bench_e2e.check_hard_eval_report() enforces:
        # combined must stay ABOVE its floor (a regression pushes it down)
        # and BELOW ceiling (a saturated 1.0 means the corpus stopped
        # measuring — the round-3 failure this corpus exists to fix);
        # per-axis floors catch a single-mode collapse the combined mean
        # could average away. Floors sit ~0.2 under the recorded values.
        gate={
            "combined_map50_min": 0.60,
            "combined_map50_max": 0.97,
            "axis_map50_min": {
                "base": 0.75, "distractors": 0.55, "occlusion": 0.55,
                "oblique": 0.50, "confusable": 0.50, "depth_noise": 0.70,
            },
            "placement_max_m": 0.1,
        },
    )
    write_report(report, args.out)
    print(json.dumps(report["axes"], indent=1))
    combined = report["axes"]["combined"]["map50"]
    base = report["axes"]["base"]["map50"]
    print(f"base mAP50={base} combined mAP50={combined}", file=sys.stderr)


if __name__ == "__main__":
    main()
