"""Hard evaluation corpus: de-saturated accuracy measurement (round 4).

The flagship accuracy gate measured mAP50 = 1.0 on the default synthetic
scenes (docs/ACCURACY_FULL_SCALE.json) — a gate at its ceiling cannot
detect gradual detector/classifier regressions. The reference validated on
real, uncontrolled iOS/LiDAR captures (/root/reference/README.md:29-33);
this module is the zero-egress equivalent: a corpus of synthetic scenes
whose axes each stress one failure mode the easy corpus cannot, tuned so
the committed detector lands BELOW ceiling and per-axis degradation moves
the number.

Axes (each = one `generate_scan` configuration, data/synthetic.py):

  base         the original easy scene (sanity anchor — stays ~1.0)
  distractors  sign-shaped rectangles in colors NEAR the trained classes,
               rendered but never ground truth → false-positive pressure
  occlusion    vertical panels in front of the wall partially covering
               signs; ground truth shrinks to the visible extent →
               truncated-box recall pressure
  oblique      3-6x the default yaw sweep; signs foreshorten and slide to
               the frame edges → localisation pressure
  confusable   sign colors shifted toward each other and toward the wall
               grey → classification/recall pressure
  depth_noise  sigma=25 mm Gaussian + 25% dropout on the depth maps —
               2D mAP is unaffected by construction; this axis instead
               reports the 3D placement error through the projection stage
  combined     distractors + occluders + oblique + confusable + noise in
               one scene — the flagship below-ceiling number the gate
               tracks (docs/ACCURACY_HARD_EVAL.json)

Scoring: `pipeline/metrics.evaluate_detections` (COCO mAP50 / mAP50-95) on
the detector's frame records vs the corpus ground truth; the depth axis
adds the worst sign placement error through `mapper.project_detections` +
3D NMS against the closed-form corner ground truth.

Round 5 — statistical power + seeded scenes: every axis is evaluated on
`EVAL_SEEDS` independently JITTERED scene instances (sign geometry/colors,
occluder/distractor placement, trajectory phase all drawn per seed —
`axis_kwargs`), pooling >= 150 GT boxes per axis, reported as across-seed
mean +/- spread. The round-4 fixed-scene corpus scored the committed
detector at 17-19 boxes/axis where ONE flipped detection moved mAP50 by
~5 points — and, worse, the detector had memorized the single fixed scene
(0.0-0.36 mAP50 under jitter); the seeded corpus measures the sign CLASS,
not one instance.

Round 5 also adds the damage-classifier stress axes (`DAMAGE_AXES`,
`run_damage_hard_eval`): blur / exposure / crop-occlusion / rectification
jitter through the REAL detect → rectify → classify path, scored as damage
confusion on IoU-matched (prediction, ground-truth) pairs.
"""

from __future__ import annotations

import json
import logging
import os

import numpy as np

from tpu3dlm.data.synthetic import Sign, default_signs

logger = logging.getLogger(__name__)


def distractor_set() -> list[Sign]:
    """Sign-shaped non-signs in colors between/near the trained classes.

    label=-1 marks them non-ground-truth (generate_scan never emits GT for
    distractor entries regardless of label; -1 is documentation)."""
    return [
        Sign(-1.35, -0.1, -0.95, 0.35, 2.82, (150, 60, 50), label=-1),   # dull red
        Sign(0.95, -0.55, 1.35, -0.2, 2.84, (60, 130, 80), label=-1),    # dull green
        Sign(1.95, -0.35, 2.35, 0.05, 2.8, (90, 90, 150), label=-1),     # grey-blue
        Sign(-0.05, 0.25, 0.4, 0.6, 2.86, (200, 120, 60), label=-1),     # orange
    ]


def occluder_set() -> list[Sign]:
    """Vertical panels between the camera and the wall, crossing signs 0
    and 2 of the default set (and wherever the confusable set places its
    signs) — a sign behind a panel keeps only its visible extent as GT."""
    return [
        Sign(-0.45, -1.2, -0.28, 1.2, 2.3, (110, 95, 80), label=-1),
        Sign(1.38, -1.2, 1.52, 1.2, 2.25, (95, 105, 90), label=-1),
    ]


def confusable_signs(strength: float = 0.45) -> list[Sign]:
    """The default signs with colors blended toward the wall grey (180) —
    the detector's color cue degrades continuously with ``strength``
    (0 = original saturated colors, 1 = invisible against the wall)."""
    base = default_signs()
    out = []
    for s in base:
        c = tuple(
            int(round(v + strength * (180 - v))) for v in s.color
        )
        out.append(
            Sign(s.x0, s.y0, s.x1, s.y1, s.z, c, label=s.label, damage=s.damage)
        )
    return out


AXES: dict[str, dict] = {
    "base": {},
    "distractors": {"distractors": distractor_set()},
    "occlusion": {"occluders": occluder_set()},
    "oblique": {"yaw_amplitude": 0.35, "x_span": (-1.1, 2.2)},
    "confusable": {"signs": confusable_signs(0.45)},
    "depth_noise": {"depth_noise_m": 0.025, "depth_dropout": 0.25},
    # the flagship below-ceiling number: every axis at MODERATE severity —
    # full-severity axes stacked multiply into ~0, which is as blind as a
    # saturated 1.0; the gate needs a value that MOVES when any one thing
    # regresses
    "combined": {
        "signs": confusable_signs(0.25),
        "distractors": distractor_set(),
        "occluders": occluder_set()[:1],
        "yaw_amplitude": 0.18,
        "x_span": (-0.8, 1.9),
        "depth_noise_m": 0.015,
        "depth_dropout": 0.1,
    },
}

# The evaluation seed set (round 5): each axis is scored on len(EVAL_SEEDS)
# independently jittered scene instances and reported as mean +/- spread,
# so one flipped detection moves the axis number by ~1 point instead of
# ~5 (VERDICT r4 weak #2: 17-19 GT boxes per axis had no statistical
# power — a gate margin smaller than single-detection noise).
EVAL_SEEDS: tuple[int, ...] = (11, 23, 37, 53, 71)


def jitter_signs(
    signs: list[Sign],
    rng: np.random.Generator,
    pos: float = 0.06,
    size: float = 0.08,
    color: float = 14.0,
    z_jitter: float = 0.02,
) -> list[Sign]:
    """Per-seed scene variation: translate/rescale each sign and shift its
    color, keeping labels/damage. Magnitudes are bounded so the structural
    invariants every axis depends on survive (occluder panels still cross
    the signs they were placed to occlude; distractor colors stay NEAR but
    not ON the class colors)."""
    out = []
    for s in signs:
        dx, dy = rng.uniform(-pos, pos, 2)
        sw = (s.x1 - s.x0) * (1.0 + rng.uniform(-size, size))
        sh = (s.y1 - s.y0) * (1.0 + rng.uniform(-size, size))
        cx = (s.x0 + s.x1) / 2 + dx
        cy = (s.y0 + s.y1) / 2 + dy
        c = tuple(
            int(np.clip(v + rng.uniform(-color, color), 0, 255))
            for v in s.color
        )
        out.append(
            Sign(
                cx - sw / 2, cy - sh / 2, cx + sw / 2, cy + sh / 2,
                s.z + float(rng.uniform(-z_jitter, z_jitter)),
                c, label=s.label, damage=s.damage,
            )
        )
    return out


def axis_kwargs(axis: str, seed: int) -> dict:
    """Seeded `generate_scan` config for one axis instance.

    Every axis (including `base`) draws jittered sign geometry/colors, a
    trajectory x-offset, and a yaw phase from `seed`, so different seeds
    view genuinely different scenes from different angles — the severity
    knobs (distractors/occluders/desaturation/noise) stay per-axis fixed
    so the axis still measures ONE failure mode."""
    import zlib

    # zlib.crc32, NOT hash(): str hashes are salted per-process and would
    # silently break cross-run corpus determinism
    rng = np.random.default_rng(
        np.random.SeedSequence([seed, zlib.crc32(axis.encode())])
    )
    signs = jitter_signs(default_signs(), rng)
    dx = float(rng.uniform(-0.12, 0.12))
    traj = {
        "yaw_phase": float(rng.uniform(0.0, 2 * np.pi)),
        "x_span": (-0.5 + dx, 1.6 + dx),
    }

    def blend(sgns, strength):
        return [
            Sign(
                s.x0, s.y0, s.x1, s.y1, s.z,
                tuple(int(round(v + strength * (180 - v))) for v in s.color),
                label=s.label, damage=s.damage,
            )
            for s in sgns
        ]

    # occluders/distractors jitter gently (x +/- 0.04 keeps the panels
    # crossing the signs' jittered x-ranges; see occluder_set geometry)
    dis = jitter_signs(distractor_set(), rng, pos=0.08, size=0.1, color=10.0)
    occ = jitter_signs(occluder_set(), rng, pos=0.04, size=0.06, color=8.0)

    if axis == "base":
        return {"signs": signs, **traj}
    if axis == "distractors":
        return {"signs": signs, "distractors": dis, **traj}
    if axis == "occlusion":
        return {"signs": signs, "occluders": occ, **traj}
    if axis == "oblique":
        return {
            "signs": signs,
            "yaw_amplitude": 0.35,
            "yaw_phase": traj["yaw_phase"],
            "x_span": (-1.1 + dx, 2.2 + dx),
        }
    if axis == "confusable":
        return {"signs": blend(signs, 0.45), **traj}
    if axis == "depth_noise":
        return {
            "signs": signs, "depth_noise_m": 0.025, "depth_dropout": 0.25,
            **traj,
        }
    if axis == "combined":
        return {
            "signs": blend(signs, 0.25),
            "distractors": dis,
            "occluders": occ[:1],
            "yaw_amplitude": 0.18,
            "yaw_phase": traj["yaw_phase"],
            "x_span": (-0.8 + dx, 1.9 + dx),
            "depth_noise_m": 0.015,
            "depth_dropout": 0.1,
        }
    raise KeyError(f"unknown hard-eval axis {axis!r} (have {list(AXES)})")


def generate_axis_scan(root: str, axis: str, num_frames: int = 7, seed: int = 7):
    """Write one seeded axis instance under <root>/<axis>_s<seed>/ and
    return its scene. The scan folder is seed-qualified so multi-seed
    sweeps coexist under one root."""
    from tpu3dlm.data import synthetic

    return synthetic.generate_scan(
        root, f"{axis}_s{seed}", num_frames=num_frames, seed=seed,
        cloud_points_per_m2=1200, **axis_kwargs(axis, seed),
    )


def _load_detector(yolo_ckpt: str, img_size: int, nc: int, conf: float,
                   max_det: int = 16, variant: str = "n"):
    import jax.numpy as jnp

    from tpu3dlm.models import weights as W
    from tpu3dlm.models.yolov10 import YOLOv10
    from tpu3dlm.pipeline.detector import ObjectDetector

    model = YOLOv10(nc=nc, variant=variant)
    template = W.init_template(
        model, jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    )
    variables = W.load_flax_checkpoint(yolo_ckpt, template)
    return ObjectDetector(
        conf_thresh=conf, img_size=img_size, nc=nc, variables=variables,
        max_det=max_det, variant=variant,
    )


def _placement_error(scan, det, scene) -> float:
    """Worst sign placement error (m) through projection + 3D NMS —
    the 3D metric the depth-noise axis exists to stress."""
    from tpu3dlm.mapper import project_detections, suppress_bboxes

    gb = project_detections(scan, det)
    opt = suppress_bboxes(gb, scan.poses).to_frame_dict()
    worst = 0.0
    for sign in scene.signs:
        best = np.inf
        for recs in opt.values():
            for rec in recs:
                corners = np.stack([np.asarray(c) for c in rec[:4]])
                e_c = np.linalg.norm(
                    corners.mean(0) - sign.corners_world.mean(0)
                )
                e_ext = np.abs(
                    np.sort(np.ptp(corners, axis=0))
                    - np.sort(np.ptp(sign.corners_world, axis=0))
                ).max()
                best = min(best, float(max(e_c, e_ext)))
        worst = max(worst, best)
    return worst


def run_hard_eval(
    yolo_ckpt: str,
    out_root: str,
    img_size: int = 128,
    nc: int = 2,
    conf: float = 0.5,
    # 14 frames ≠ any training trajectory's frame count, so the evaluation
    # viewpoints are never the training viewpoints (scripts/hard_eval.py);
    # 5 seeds x 14 frames x ~2.7 GT boxes/frame lands every axis at
    # >= 150 GT boxes (VERDICT r4 task 2 statistical-power floor)
    num_frames: int = 14,
    axes: list[str] | None = None,
    seeds: tuple[int, ...] = EVAL_SEEDS,
    variant: str = "n",
) -> dict:
    """Detect over every (axis, seed) scene instance; returns the report.

    Per axis the report carries the across-seed mean of each metric (under
    the historical key names, so the gate logic is unchanged), plus
    `map50_per_seed`, `map50_spread` (max - min across seeds) and
    `map50_std`; `n_gt`/`n_pred` are pooled totals."""
    from tpu3dlm.data.dataset import load_scan
    from tpu3dlm.pipeline.metrics import evaluate_detections

    detector = _load_detector(yolo_ckpt, img_size, nc, conf, variant=variant)
    report: dict = {"axes": {}, "img_size": img_size, "conf_thresh": conf,
                    "num_frames": num_frames, "seeds": list(seeds),
                    "yolo_variant": variant}
    for axis in axes or list(AXES):
        per_seed: list[dict] = []
        for seed in seeds:
            scene = generate_axis_scan(
                out_root, axis, num_frames=num_frames, seed=seed
            )
            base = os.path.join(out_root, f"{axis}_s{seed}", "rtabmap_extract")
            scan = load_scan(
                image_dir=os.path.join(base, "data_rgb"),
                depth_image_dir=os.path.join(base, "data_depth"),
                calibration_dir=os.path.join(base, "calibration"),
                pose_path=os.path.join(out_root, f"{axis}_s{seed}",
                                       "poses.txt"),
                img_size=img_size,
            )
            det = detector.detect(scan)
            metrics = evaluate_detections(
                det.to_frame_dict(), scene.gt_boxes_2d
            )
            one = {
                "map50": float(metrics.map50),
                "map50_95": float(metrics.map50_95),
                "precision": float(metrics.precision),
                "recall": float(metrics.recall),
                "n_gt": int(metrics.num_ground_truth),
                "n_pred": int(metrics.num_predictions),
            }
            if axis in ("base", "depth_noise"):
                one["worst_placement_m"] = _placement_error(scan, det, scene)
            per_seed.append(one)

        m50 = np.array([s["map50"] for s in per_seed])
        entry = {
            "map50": round(float(m50.mean()), 4),
            "map50_per_seed": [round(float(v), 4) for v in m50],
            "map50_spread": round(float(m50.max() - m50.min()), 4),
            "map50_std": round(float(m50.std()), 4),
            "map50_95": round(
                float(np.mean([s["map50_95"] for s in per_seed])), 4
            ),
            "precision": round(
                float(np.mean([s["precision"] for s in per_seed])), 4
            ),
            "recall": round(
                float(np.mean([s["recall"] for s in per_seed])), 4
            ),
            "n_gt": int(sum(s["n_gt"] for s in per_seed)),
            "n_pred": int(sum(s["n_pred"] for s in per_seed)),
        }
        if axis in ("base", "depth_noise"):
            entry["worst_placement_m"] = round(
                max(s["worst_placement_m"] for s in per_seed), 4
            )
        report["axes"][axis] = entry
        logger.info("hard-eval %s: %s", axis, entry)
    return report


# ---------------------------------------------------------------------------
# Damage-classifier stress axes (round 5, VERDICT r4 weak #3): the detector
# had a stress curve; BEiT damage accuracy was only ever scored on matched
# rows of the easy full-scale scene. These axes perturb what the CLASSIFIER
# sees — through the REAL path (detect → rectify → classify), not isolated
# crops — and score damage confusion per axis.

DAMAGE_AXES: tuple[str, ...] = (
    "clean", "blur", "exposure", "crop_occlusion", "box_jitter"
)


def _perturb_scan_rgb(rgb: np.ndarray, axis: str, rng: np.random.Generator,
                      gt_boxes_px: dict[int, list[list[float]]] | None = None,
                      scan=None) -> np.ndarray:
    """Stored-frame perturbations for the image-level damage axes.

    blur            defocus/motion softness: Gaussian sigma 3.0 at stored
                    resolution — strong enough to bleed wall color into the
                    sign crops (flat-color synthetic signs are invariant to
                    mild blur, which saturated the axis at 1.0);
    exposure        lighting shift: frames alternate DARK (gain 0.4-0.55)
                    and BRIGHT (gain 1.5-1.8) plus an offset, so every
                    seed scores both directions — a single per-seed gain
                    direction measured a 0.6 across-seed spread (dark
                    gains break the color cue much harder than bright);
    crop_occlusion  a patch covering ~56% of every GT sign is painted a
                    random dull color — the classifier sees partial signs
                    (positions drawn per frame from ``rng``).

    Severities are tuned so the committed classifier lands BELOW ceiling
    on at least the exposure axis (a stress gate saturated at 1.0 is the
    round-3 blindness in a new coat) while clean stays ~1.0.
    """
    import cv2

    out = np.asarray(rgb).copy()
    if axis == "blur":
        for f in range(out.shape[0]):
            out[f] = cv2.GaussianBlur(out[f], (0, 0), 3.0)
    elif axis == "exposure":
        for f in range(out.shape[0]):
            gain = (
                float(rng.uniform(0.4, 0.55)) if f % 2 == 0
                else float(rng.uniform(1.5, 1.8))
            )
            off = float(rng.uniform(-25, 25))
            out[f] = np.clip(
                out[f].astype(np.float32) * gain + off, 0, 255
            ).astype(np.uint8)
    elif axis == "crop_occlusion":
        assert gt_boxes_px is not None and scan is not None
        from tpu3dlm.pipeline.selftrain import scale_boxes_to_frame

        for f, recs in gt_boxes_px.items():
            if not recs or not (0 <= f < out.shape[0]):
                continue
            raw = np.asarray([r[:4] for r in recs], np.float32)
            boxes = scale_boxes_to_frame(raw, scan, np.full(len(recs), f))
            for b in boxes:
                x1, y1, x2, y2 = b
                w, h = x2 - x1, y2 - y1
                if w < 4 or h < 4:
                    continue
                pw, ph = 0.75 * w, 0.75 * h  # ~56% of the box area
                px = x1 + rng.uniform(0, max(w - pw, 1e-3))
                py = y1 + rng.uniform(0, max(h - ph, 1e-3))
                color = rng.integers(60, 160, 3)
                out[f, int(py):int(py + ph), int(px):int(px + pw)] = color
    return out


def _jitter_boxes(boxes: np.ndarray, mask: np.ndarray,
                  rng: np.random.Generator, frac: float = 0.25) -> np.ndarray:
    """Rectification jitter: shift/scale each detection box by up to
    ``frac`` of its size (loose detector boxes are what the rectifier sees
    in production — the crop gains background or loses sign margin)."""
    out = np.asarray(boxes, np.float32).copy()
    w = out[..., 2] - out[..., 0]
    h = out[..., 3] - out[..., 1]
    for k, s in ((0, w), (1, h), (2, w), (3, h)):
        out[..., k] += rng.uniform(-frac, frac, out.shape[:2]) * s
    return np.where(mask[..., None], out, boxes)


def run_damage_hard_eval(
    yolo_ckpt: str,
    beit_ckpt: str,
    out_root: str,
    img_size: int = 128,
    nc: int = 2,
    conf: float = 0.5,
    beit_kw: dict | None = None,
    num_frames: int = 14,
    axes: tuple[str, ...] | None = None,
    seeds: tuple[int, ...] = EVAL_SEEDS,
    variant: str = "n",
) -> dict:
    """Score the damage classifier through detect → rectify → classify on
    every (axis, seed) scene instance.

    Per axis: detections matched one-to-one to ground-truth boxes (IoU >=
    0.5, class-consistent — pipeline/metrics.matched_pairs); the matched
    pairs' (gt damage, predicted damage) feed accuracy / per-class PRF1 /
    confusion. Reported as across-seed mean accuracy +/- spread with the
    pooled confusion, n_pairs >= 150 per axis at the defaults."""
    import dataclasses as _dc

    import jax.numpy as jnp

    from tpu3dlm.data.dataset import load_scan
    from tpu3dlm.models.beit import BeitConfig
    from tpu3dlm.models import weights as W
    from tpu3dlm.models.beit import BeitClassifier
    from tpu3dlm.pipeline.classifier import DamageDetector
    from tpu3dlm.pipeline.metrics import (
        box_iou,
        evaluate_classification,
        matched_pairs,
    )

    detector = _load_detector(yolo_ckpt, img_size, nc, conf, variant=variant)
    beit_kw = beit_kw or dict(image_size=32, hidden_size=32, num_layers=2,
                              num_heads=2, intermediate_size=64)
    cfg = BeitConfig(num_labels=2, **{k: v for k, v in beit_kw.items()
                                      if k != "num_labels"})
    template = W.init_template(
        BeitClassifier(cfg),
        jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32),
    )
    beit_vars = W.load_flax_checkpoint(beit_ckpt, template)
    classifier = DamageDetector(config=cfg, variables=beit_vars)

    report: dict = {"axes": {}, "img_size": img_size, "conf_thresh": conf,
                    "num_frames": num_frames, "seeds": list(seeds),
                    "metric": "damage_classifier_hard_eval"}
    for axis in axes or DAMAGE_AXES:
        per_seed_acc: list[float] = []
        y_true_all: list[int] = []
        y_pred_all: list[int] = []
        for seed in seeds:
            rng = np.random.default_rng(
                np.random.SeedSequence([seed, 0xDA3A6E])
            )
            # all damage axes share the seed's jittered BASE scene — the
            # perturbation is the ONLY difference vs `clean`, so an axis
            # delta attributes to the perturbation, not scene variation
            from tpu3dlm.data import synthetic as _syn

            scene = _syn.generate_scan(
                out_root, f"dmg_{axis}_s{seed}", num_frames=num_frames,
                seed=seed, cloud_points_per_m2=1200,
                **axis_kwargs("base", seed),
            )
            base = os.path.join(out_root, f"dmg_{axis}_s{seed}",
                                "rtabmap_extract")
            scan = load_scan(
                image_dir=os.path.join(base, "data_rgb"),
                depth_image_dir=os.path.join(base, "data_depth"),
                calibration_dir=os.path.join(base, "calibration"),
                pose_path=os.path.join(out_root, f"dmg_{axis}_s{seed}",
                                       "poses.txt"),
                img_size=img_size,
            )
            if axis in ("blur", "exposure"):
                scan = _dc.replace(
                    scan,
                    rgb=_perturb_scan_rgb(
                        scan.rgb, axis, rng,
                        gt_boxes_px=scene.gt_boxes_2d, scan=scan,
                    ),
                )
            det = detector.detect(scan)
            if axis == "box_jitter":
                det = _dc.replace(
                    det,
                    boxes=_jitter_boxes(
                        np.asarray(det.boxes), np.asarray(det.mask), rng
                    ),
                )
            if axis == "crop_occlusion":
                # perturb AFTER detection: this axis scores the CLASSIFIER
                # under occluded crops (the detector's own occlusion curve
                # is the detector corpus's axis) — painting before detect
                # starved the axis to ~60 matched pairs because the
                # detector dropped the occluded signs, measuring the wrong
                # stage's failure
                scan = _dc.replace(
                    scan,
                    rgb=_perturb_scan_rgb(
                        scan.rgb, axis, rng,
                        gt_boxes_px=scene.gt_boxes_2d, scan=scan,
                    ),
                )
            det = classifier.classify_detections(scan, det)

            y_true: list[int] = []
            y_pred: list[int] = []
            boxes = np.asarray(det.boxes)
            labels = np.asarray(det.label)
            damage = np.asarray(det.damage)
            mask = np.asarray(det.mask)
            for f, gt_rows in scene.gt_boxes_2d.items():
                if not gt_rows or not (0 <= f < scan.num_frames):
                    continue
                valid = np.nonzero(mask[f])[0]
                if valid.size == 0:
                    continue
                gt_b = np.asarray([r[:4] for r in gt_rows], np.float32)
                gt_l = np.asarray([r[5] for r in gt_rows], int)
                gt_d = scene.gt_damage_2d.get(f, [0] * len(gt_rows))
                ious = box_iou(boxes[f][valid], gt_b)
                for p, g in matched_pairs(ious, labels[f][valid], gt_l, 0.5):
                    y_true.append(int(gt_d[g]))
                    y_pred.append(int(damage[f][valid[p]]))
            if y_true:
                m = evaluate_classification(
                    np.asarray(y_true), np.asarray(y_pred), 2
                )
                per_seed_acc.append(float(m.accuracy))
            y_true_all += y_true
            y_pred_all += y_pred

        pooled = evaluate_classification(
            np.asarray(y_true_all, int), np.asarray(y_pred_all, int), 2
        )
        acc = np.asarray(per_seed_acc) if per_seed_acc else np.zeros(1)
        entry = {
            "accuracy": round(float(acc.mean()), 4),
            "accuracy_per_seed": [round(float(v), 4) for v in acc],
            "accuracy_spread": round(float(acc.max() - acc.min()), 4),
            "macro_f1": round(pooled.macro_f1, 4),
            "per_class_f1": {
                int(c): round(v, 4) for c, v in pooled.per_class_f1.items()
            },
            "confusion": pooled.confusion.tolist(),
            "n_pairs": len(y_true_all),
        }
        report["axes"][axis] = entry
        logger.info("damage hard-eval %s: %s", axis, entry)
    return report


def write_report(report: dict, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
