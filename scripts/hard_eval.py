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

    # wider-variant evidence (PERF.md deployment point C): same corpus,
    # same gates, variant-suffixed artifact (ACCURACY_HARD_EVAL_FULL_S)
    PYTHONPATH=. python scripts/hard_eval.py --train --full-scale \
        --variant s --skip-damage --steps 2000

Training corpus (--train): ``training_specs()`` — 14 domain-randomized
scenes (jittered sign geometry/colors covering the eval jitter, occluders,
distractors, desaturation, oblique sweeps, depth noise) plus in-jit
augmentation (flip, color jitter, crop-zoom, random erasing —
ops/augment.py), so the detector learns the sign CLASS rather than one
scene instance. The round-4 fixed-scene recipe scored mAP50 0.0-0.36 on
the round-5 multi-seed corpus — pure memorization of exact colors and
positions; this recipe exists to fix that.
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


def training_specs(n_scenes: int = 14, rng_seed: int = 5000) -> list[dict]:
    """Domain-randomized training corpus (round 5).

    The round-4 recipe trained on FOUR fixed trajectories over the exact
    default scene — and the multi-seed eval corpus exposed that as
    memorization: the fixture detector scored mAP50 0.0-0.36 on scenes
    whose sign positions/sizes/colors were jittered by amounts the eval
    axes now draw per seed (pipeline/hardeval.axis_kwargs). This generator
    builds ``n_scenes`` scenes whose randomization COVERS the eval jitter
    (wider position/size/color ranges), mixing in occluders, distractors,
    color desaturation, oblique sweeps, and depth noise at train time with
    positions/strengths drawn from a seed space (SeedSequence([rng_seed,
    i])) disjoint from the eval seeds (hardeval.EVAL_SEEDS streams).
    """
    import numpy as np

    from tpu3dlm.data.synthetic import Sign, default_signs
    from tpu3dlm.pipeline.hardeval import (
        distractor_set,
        jitter_signs,
        occluder_set,
    )

    specs = []
    for i in range(n_scenes):
        rng = np.random.default_rng(np.random.SeedSequence([rng_seed, i]))
        # wider than eval jitter (pos .06 / size .08 / color 14)
        signs = jitter_signs(
            default_signs(), rng, pos=0.1, size=0.12, color=20.0
        )
        blend = float(rng.choice([0.0, 0.0, 0.2, 0.35, 0.5]))
        if blend:
            signs = [
                Sign(
                    s.x0, s.y0, s.x1, s.y1, s.z,
                    tuple(
                        int(round(v + blend * (180 - v))) for v in s.color
                    ),
                    label=s.label, damage=s.damage,
                )
                for s in signs
            ]
        oblique = bool(rng.uniform() < 0.3)
        dx = float(rng.uniform(-0.2, 0.2))
        span = (-1.1 + dx, 2.2 + dx) if oblique else (-0.5 + dx, 1.6 + dx)
        kw = dict(
            num_frames=int(rng.integers(5, 10)),
            seed=1000 + i,
            signs=signs,
            yaw_phase=float(rng.uniform(0.0, 2 * np.pi)),
            yaw_amplitude=0.35 if oblique else float(rng.uniform(0.05, 0.2)),
            x_span=span,
        )
        r = float(rng.uniform())
        if r < 0.35:
            kw["distractors"] = jitter_signs(
                distractor_set(), rng, pos=0.15, size=0.15, color=15.0
            )
        if 0.25 < r < 0.65:
            kw["occluders"] = jitter_signs(
                occluder_set(), rng, pos=0.1, size=0.12, color=12.0
            )
        if rng.uniform() < 0.3:
            kw["depth_noise_m"] = 0.02
            kw["depth_dropout"] = 0.15
        specs.append(kw)
    return specs


def train_checkpoints(out_dir: str, img_size: int, nc: int, steps: int,
                      beit_steps: int, full_scale: bool,
                      n_scenes: int = 14, variant: str = "n"):
    """Domain-randomized augmented finetune → (yolo_ckpt, beit_ckpt)."""
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

    root = tempfile.mkdtemp(prefix="tpu3dlm_hard_train_")
    specs = training_specs(n_scenes)
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
    # round-5 recipe: random erasing ON (the occlusion-robustness
    # augmentation), stronger photometric jitter (the confusable axis
    # desaturates colors), cosine schedule + EMA for the longer runs, and
    # a bounded in-jit minibatch at 640 (full-batch would hold ~90 frames
    # of 640² activations)
    aug = dict(erase_p=0.5, erase_count=2, erase_max=0.35,
               brightness=0.3, contrast=0.3)
    yolo_vars = finetune_yolo(
        images, boxes, labels, mask, nc=nc, img_size=img_size,
        steps=steps, augment=aug, variant=variant,
        schedule="cosine", ema_decay=0.995,
        sample_batch=16 if full_scale else None,
    )
    beit_cfg = BeitConfig(num_labels=2, **{k: v for k, v in beit_kw.items()
                                           if k != "num_labels"})
    # crop augmentation ON (round 5): the un-augmented classifier dropped
    # to 0.74 under the exposure stress axis — same train-distribution
    # failure the detector had, one stage later
    os.makedirs(out_dir, exist_ok=True)
    suffix = ("_full" if full_scale else "") + (
        f"_{variant}" if variant != "n" else ""
    )
    yolo_path = os.path.join(out_dir, f"yolo_hard{suffix}.msgpack")
    save_flax_checkpoint(yolo_path, yolo_vars)
    beit_path = None
    if beit_steps > 0:
        beit_params = finetune_beit(
            np.concatenate(crops_all), np.concatenate(dmg_all), beit_cfg,
            steps=beit_steps, augment=True,
        )
        beit_path = os.path.join(out_dir, f"beit_hard{suffix}.msgpack")
        save_flax_checkpoint(beit_path, beit_params)
    return yolo_path, beit_path


def main():
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--train", action="store_true",
                    help="retrain checkpoints on the widened corpus first")
    ap.add_argument("--full-scale", action="store_true",
                    help="YOLOv10-n @ 640 (TPU recommended)")
    ap.add_argument("--variant", default="n", choices=["n", "s", "m"],
                    help="YOLOv10 width variant (PERF.md deployment point "
                         "C evidence: train+evaluate the wider variants "
                         "on the same stress corpus)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--beit-steps", type=int, default=None)
    ap.add_argument("--yolo-ckpt", default=None,
                    help="evaluate this checkpoint instead of training/fixtures")
    ap.add_argument("--beit-ckpt", default=None,
                    help="damage-eval this BEiT checkpoint (default: the "
                         "trained/fixture one)")
    ap.add_argument("--skip-damage", action="store_true",
                    help="skip the damage-classifier stress eval")
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
    # round-5 corpus is ~3.5x larger and domain-randomized — the old 600
    # full-batch steps underfit it
    steps = args.steps or (4000 if args.full_scale else 3000)
    beit_steps = args.beit_steps or (160 if args.full_scale else 120)
    if args.skip_damage and args.train and args.beit_steps is None:
        beit_steps = 0  # don't train the (expensive) classifier unused here

    t0 = time.time()
    beit_ckpt = args.beit_ckpt
    if args.yolo_ckpt:
        yolo_ckpt = args.yolo_ckpt
    elif args.train:
        yolo_ckpt, beit_ckpt = train_checkpoints(
            args.out_dir, img_size, nc, steps, beit_steps, args.full_scale,
            variant=args.variant,
        )
        if args.update_fixtures and not args.full_scale:
            import shutil

            shutil.copy(yolo_ckpt, os.path.join(FIXTURES, "yolo_synthetic.msgpack"))
            shutil.copy(beit_ckpt, os.path.join(FIXTURES, "beit_synthetic.msgpack"))
            logging.info("fixtures updated in %s", FIXTURES)
    else:
        yolo_ckpt = os.path.join(FIXTURES, "yolo_synthetic.msgpack")
        beit_ckpt = beit_ckpt or os.path.join(FIXTURES, "beit_synthetic.msgpack")
    train_s = time.time() - t0

    from tpu3dlm.pipeline.hardeval import run_hard_eval, write_report

    t0 = time.time()
    # conf 0.3: the calibrated stress-eval operating point (round 5).
    # The EMA+cosine+erase recipe shifts the confidence distribution down
    # vs the round-4 recipe; a sweep on the retrained checkpoint measured
    # recall 0.43 -> 0.84 moving conf 0.5 -> 0.25 at precision 1.0 -> 0.67,
    # with the balanced point near 0.3. The serving default stays
    # conf_thresh = 0.5 (precision-first); the artifact records its conf.
    report = run_hard_eval(
        yolo_ckpt, tempfile.mkdtemp(prefix="tpu3dlm_hard_eval_"),
        img_size=img_size, nc=nc, conf=0.3, variant=args.variant,
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
        # could average away. Round-5 floors sit >= 3x the measured
        # across-seed spread under the recorded means
        # (tests/test_accuracy_gates.py pins the margin property), and
        # min_n_gt_per_axis pins the corpus's statistical power.
        # round-5 floors, calibrated on the retrained checkpoint's measured
        # means/stds (conf 0.3, 5 seeds): every floor sits >= 3x the axis's
        # across-seed std under its mean (e.g. occlusion 0.878 std 0.040 →
        # floor 0.70 leaves 0.178 = 4.4 sigma), so a gate flip needs a real
        # regression, not one noisy seed. placement_max 0.12 vs measured
        # worst 0.095 over the 5-seed corpus.
        gate=(
            # full-scale (640²) floors: the production operating point
            # measures 0.932-0.952 per axis (combined 0.933 std 0.043),
            # so floors sit at 0.78-0.80 — >=3 sigma under every mean
            # while far above the round-4 0.58 failure this gate exists
            # to prevent regressing to
            {
                "combined_map50_min": 0.78,
                "combined_map50_max": 0.97,
                "axis_map50_min": {
                    "base": 0.80, "distractors": 0.80, "occlusion": 0.80,
                    "oblique": 0.80, "confusable": 0.80,
                    "depth_noise": 0.80,
                },
                "placement_max_m": 0.12,
                "min_n_gt_per_axis": 150,
            }
            if args.full_scale
            else {
                "combined_map50_min": 0.65,
                "combined_map50_max": 0.97,
                "axis_map50_min": {
                    "base": 0.78, "distractors": 0.75, "occlusion": 0.70,
                    "oblique": 0.70, "confusable": 0.80,
                    "depth_noise": 0.82,
                },
                "placement_max_m": 0.12,
                "min_n_gt_per_axis": 150,
            }
        ),
    )
    out = args.out
    if args.variant != "n" and out.endswith("ACCURACY_HARD_EVAL.json"):
        # variant evidence gets its own artifact next to the n ones,
        # e.g. ACCURACY_HARD_EVAL_FULL_S.json for --full-scale --variant s
        suffix = ("_FULL" if args.full_scale else "") \
            + f"_{args.variant.upper()}"
        out = out.replace(".json", f"{suffix}.json")
    write_report(report, out)
    print(json.dumps(report["axes"], indent=1))
    combined = report["axes"]["combined"]["map50"]
    base = report["axes"]["base"]["map50"]
    print(f"base mAP50={base} combined mAP50={combined}", file=sys.stderr)

    if not args.skip_damage and beit_ckpt:
        from tpu3dlm.pipeline.evaluate import BEIT_KW, FULL_BEIT_KW
        from tpu3dlm.pipeline.hardeval import run_damage_hard_eval

        t0 = time.time()
        beit_kw = FULL_BEIT_KW if args.full_scale else BEIT_KW
        dmg = run_damage_hard_eval(
            yolo_ckpt, beit_ckpt,
            tempfile.mkdtemp(prefix="tpu3dlm_damage_eval_"),
            img_size=img_size, nc=nc, conf=0.3, variant=args.variant,
            beit_kw={k: v for k, v in beit_kw.items() if k != "num_labels"},
        )
        dmg.update(
            hardware=report["hardware"],
            date=report["date"],
            checkpoint=os.path.basename(beit_ckpt),
            scale=report["scale"],
            eval_seconds=round(time.time() - t0, 1),
            # bench_e2e.check_damage_eval_report floors, calibrated on the
            # retrained classifier (5 seeds): exposure (0.74 +/- 0.21
            # spread) and crop_occlusion (0.92 +/- 0.17) are the
            # discriminating axes; blur and box_jitter measure 1.0 —
            # the flat-color synthetic signs keep their color cue under
            # blur and moderate crop shift, i.e. the classifier IS robust
            # there — and their floors exist to catch a future drop off
            # that ceiling. Floors sit >= 3x the across-seed noise under
            # the means.
            gate=(
                # BEiT-base at 224 is markedly more robust than the toy
                # classifier (exposure 0.94 vs 0.74) — crop_occlusion
                # (0.756, std ~0.08) is its discriminating axis
                {
                    "axis_accuracy_min": {
                        "clean": 0.95, "blur": 0.90, "exposure": 0.70,
                        "crop_occlusion": 0.45, "box_jitter": 0.90,
                    },
                    "macro_f1_min": 0.90,
                    "min_pairs_per_axis": 150,
                }
                if args.full_scale
                else {
                    # round-5 crop augmentation (exposure-range gain +
                    # erase, ops/augment.augment_crop_batch) closed the
                    # classifier's own stress gaps: exposure 0.74 -> 1.00,
                    # crop_occlusion 0.92 -> 0.96 — floors raised to sit
                    # just under the new ceiling so the axes stay
                    # regression-sensitive
                    "axis_accuracy_min": {
                        "clean": 0.95, "blur": 0.90, "exposure": 0.90,
                        "crop_occlusion": 0.75, "box_jitter": 0.90,
                    },
                    "macro_f1_min": 0.90,
                    "min_pairs_per_axis": 150,
                }
            ),
        )
        suffix = "_FULL" if args.full_scale else ""
        dmg_out = os.path.join(REPO, "docs",
                               f"ACCURACY_DAMAGE_EVAL{suffix}.json")
        write_report(dmg, dmg_out)
        print(json.dumps(
            {a: {"accuracy": e["accuracy"], "n_pairs": e["n_pairs"]}
             for a, e in dmg["axes"].items()}, indent=1))


if __name__ == "__main__":
    main()
