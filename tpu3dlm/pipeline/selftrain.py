"""Native finetuning driver: produce the framework's own YOLOv10/BEiT
checkpoints from a scan with known ground truth.

The reference pipeline consumes checkpoints finetuned *offline* with
ultralytics/HF tooling (src/detector/detector.py:36,
src/damage/classifier.py:32-35) — the training loop itself is outside the
reference. This module closes that loop natively: data-parallel
`shard_map` train steps (parallel/finetune.py) over the ground-truth boxes
of a scan (e.g. the synthetic generator's gt.json), emitting msgpack
checkpoints the Pipeline loads via cfg.yolo_weights / cfg.beit_weights.

Usage (CLI):
    python -m tpu3dlm.pipeline.selftrain --data-dir <scan folder> \
        --out-dir <ckpt dir> [--img-size 96] [--yolo-steps 200] ...
"""

from __future__ import annotations

import logging
import os

import numpy as np

logger = logging.getLogger(__name__)


def scale_boxes_to_frame(boxes_px: np.ndarray, scan, frame_idx) -> np.ndarray:
    """(N, 4) original-pixel boxes of given frames → stored-frame pixels
    (handles both square-resize and letterbox scans)."""
    out = np.asarray(boxes_px, np.float32).copy()
    if scan.letterbox is not None:
        lb = np.asarray(scan.letterbox)[frame_idx]
        out[:, [0, 2]] = out[:, [0, 2]] * lb[:, 0:1] + lb[:, 1:2]
        out[:, [1, 3]] = out[:, [1, 3]] * lb[:, 0:1] + lb[:, 2:3]
    else:
        wh = np.asarray(scan.rgb_size)[frame_idx]
        S = float(np.shape(scan.rgb)[1])
        out[:, [0, 2]] *= (S / wh[:, 0:1])
        out[:, [1, 3]] *= (S / wh[:, 1:2])
    return out


def yolo_training_arrays(
    gt_boxes_2d: dict[int, list[list[float]]], scan, max_gt: int = 8
):
    """Ground-truth records ([x1,y1,x2,y2,conf,label] in original pixels)
    → padded detector-space training arrays (images, boxes, labels, mask)."""
    F = scan.num_frames
    images = np.asarray(scan.rgb)
    boxes = np.zeros((F, max_gt, 4), np.float32)
    labels = np.zeros((F, max_gt), np.int32)
    mask = np.zeros((F, max_gt), bool)
    for f in range(F):
        recs = gt_boxes_2d.get(f, [])[:max_gt]
        if not recs:
            continue
        raw = np.asarray([r[:4] for r in recs], np.float32)
        scaled = scale_boxes_to_frame(raw, scan, np.full(len(recs), f))
        for b, rec in enumerate(recs):
            boxes[f, b] = scaled[b]
            labels[f, b] = int(rec[5])
            mask[f, b] = True
    return images, boxes, labels, mask


def beit_training_crops(
    gt_boxes_2d: dict[int, list[list[float]]],
    gt_damage_2d: dict[int, list[int]],
    scan,
    size: int,
):
    """Rectified uint8 crops of every ground-truth box + damage labels."""
    import jax
    import jax.numpy as jnp

    from tpu3dlm.ops.image import _rectify_one_mxu

    frames, flat_boxes, labels = [], [], []
    for f, recs in gt_boxes_2d.items():
        if not (0 <= f < scan.num_frames):
            # load_scan truncates to min(paired frames, pose rows) — gt on
            # a trailing frame the scan dropped must not IndexError here
            # (the yolo path iterates range(scan.num_frames) for the same
            # reason)
            continue
        dmg = gt_damage_2d.get(f, [0] * len(recs))
        for rec, d in zip(recs, dmg):
            frames.append(f)
            flat_boxes.append(rec[:4])
            labels.append(int(d))
    if not frames:
        return (
            np.zeros((0, size, size, 3), np.uint8),
            np.zeros((0,), np.int32),
        )
    frame_idx = np.asarray(frames)
    boxes = scale_boxes_to_frame(np.asarray(flat_boxes, np.float32), scan, frame_idx)
    # index the uint8 scan FIRST, then convert: converting the whole scan
    # to float32 materialises ~4x the scan bytes (GBs at 500+ frames) for
    # what is usually a handful of gt frames
    rgb_sel = np.asarray(scan.rgb)[frame_idx].astype(np.float32) / 255.0
    crops = jax.vmap(_rectify_one_mxu, in_axes=(0, 0, None))(
        jnp.asarray(rgb_sel), jnp.asarray(boxes), (size, size)
    )
    crops_u8 = np.clip(np.asarray(crops) * 255.0, 0, 255).astype(np.uint8)
    return crops_u8, np.asarray(labels, np.int32)


def _pad_batch(arrays, n: int):
    """Pad leading axis of each array to a multiple of n (zeros/False)."""
    out = []
    for x in arrays:
        extra = (-x.shape[0]) % n
        if extra:
            pad = np.zeros((extra,) + x.shape[1:], x.dtype)
            x = np.concatenate([x, pad])
        out.append(x)
    return out


def evaluate_yolo_map(
    yolo,
    variables,
    images_f32,
    gt_boxes: np.ndarray,
    gt_labels: np.ndarray,
    gt_mask: np.ndarray,
    img_size: int,
    conf_thresh: float = 0.25,
    max_det: int = 32,
) -> dict:
    """Detection-quality snapshot of a training checkpoint: eval-mode
    forward + NMS-free postprocess → pipeline/metrics mAP vs the padded gt
    arrays. Returns the DetectionMetrics dict."""
    import jax

    from tpu3dlm.models.yolov10 import postprocess
    from tpu3dlm.pipeline.metrics import evaluate_detections

    @jax.jit
    def _detect(variables, images):
        raw = yolo.apply(variables, images)["one2one_split"]
        return postprocess(raw, img_size=img_size, max_det=max_det)

    out = jax.device_get(_detect(variables, images_f32))
    preds: dict[int, list] = {}
    gts: dict[int, list] = {}
    F = np.shape(images_f32)[0]
    for f in range(F):
        keep = out["conf"][f] >= conf_thresh
        preds[f] = [
            [*out["boxes"][f, i].tolist(), float(out["conf"][f, i]),
             int(out["label"][f, i])]
            for i in np.where(keep)[0]
        ]
        gts[f] = [
            [*np.asarray(gt_boxes[f, b], float).tolist(), 1.0,
             int(gt_labels[f, b])]
            for b in np.where(np.asarray(gt_mask[f]))[0]
        ]
    return evaluate_detections(preds, gts).to_dict()


def finetune_yolo(
    images_u8: np.ndarray,
    gt_boxes: np.ndarray,
    gt_labels: np.ndarray,
    gt_mask: np.ndarray,
    nc: int,
    img_size: int,
    steps: int = 200,
    lr: float = 2e-3,
    variant: str = "n",
    mesh=None,
    seed: int = 0,
    log_every: int = 50,
    augment: dict | bool | None = None,
    ema_decay: float | None = None,
    schedule: str = "const",
    warmup_frac: float = 0.1,
    val_every: int = 0,
    val_history: list | None = None,
    sample_batch: int | None = None,
):
    """Overfit/adapt YOLOv10 on (images, gt) — returns trained variables.

    Data-parallel over the mesh's batch axis (frames padded to a device
    multiple; padded frames have empty gt, i.e. pure-background signal).

    Training options (all off by default — the committed fixture
    checkpoints were trained with the plain recipe):

    * ``augment`` — ``True``/kwarg-dict enables in-jit flip + color jitter
      + MXU crop-zoom (ops/augment.py), the ultralytics-DataLoader
      analogue run on device;
    * ``ema_decay`` — keep an exponential moving average of the params and
      return it as the checkpoint (ultralytics' ModelEMA analogue);
    * ``schedule="cosine"`` — warmup + cosine decay to 5% of ``lr``
      (``warmup_frac`` of the steps), instead of constant lr;
    * ``val_every=N`` — every N steps score eval-mode mAP50/mAP50-95 on
      the training arrays via pipeline/metrics and log it; entries are
      appended to ``val_history`` when given.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from tpu3dlm.models.yolov10 import YOLOv10
    from tpu3dlm.parallel.finetune import ema_update, make_yolo_train_step
    from tpu3dlm.parallel.mesh import make_mesh

    # default is a SINGLE-device mesh (the e2e accuracy loop runs on one
    # chip); pass mesh=make_mesh() explicitly for data-parallel training
    mesh = mesh or make_mesh(1)
    n_dev = mesh.devices.size
    images_u8, gt_boxes, gt_labels, gt_mask = _pad_batch(
        [np.asarray(images_u8), np.asarray(gt_boxes),
         np.asarray(gt_labels), np.asarray(gt_mask)],
        n_dev,
    )

    yolo = YOLOv10(nc=nc, variant=variant)
    variables = yolo.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    )
    if schedule == "cosine":
        sched = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=lr,
            warmup_steps=max(int(steps * warmup_frac), 1),
            decay_steps=max(steps, 2),
            end_value=lr * 0.05,
        )
        tx = optax.adamw(sched)
    elif schedule == "const":
        tx = optax.adamw(lr)
    else:
        raise ValueError(f"unknown schedule {schedule!r} (const|cosine)")
    opt_state = tx.init(variables["params"])
    # augment=True and augment={} BOTH mean "defaults" (make_yolo_train_step
    # documents {} as default kwargs); only None/False disable — `augment or
    # None` would collapse the empty dict to disabled
    if augment is True:
        aug_kw = {}
    elif augment is None or augment is False:
        aug_kw = None
    else:
        aug_kw = augment
    step = make_yolo_train_step(
        yolo, tx, mesh, img_size, augment=aug_kw, sample_batch=sample_batch
    )

    imgs = jnp.asarray(images_u8.astype(np.float32) / 255.0)
    gb, gl, gm = jnp.asarray(gt_boxes), jnp.asarray(gt_labels), jnp.asarray(gt_mask)
    ema_params = variables["params"] if ema_decay else None
    base_key = jax.random.PRNGKey(seed + 1)
    for i in range(steps):
        if aug_kw is None:
            variables, opt_state, loss = step(variables, opt_state, imgs, gb, gl, gm)
        else:
            key = jax.random.fold_in(base_key, i)
            variables, opt_state, loss = step(
                variables, opt_state, key, imgs, gb, gl, gm
            )
        if ema_decay:
            ema_params = ema_update(ema_params, variables["params"], ema_decay)
        if log_every and (i % log_every == 0 or i == steps - 1):
            logger.info("yolo finetune step %d: loss=%.4f", i, float(loss))
        if val_every and (i % val_every == 0 or i == steps - 1):
            eval_vars = variables if ema_params is None else {
                "params": ema_params, "batch_stats": variables["batch_stats"]
            }
            m = evaluate_yolo_map(
                yolo, eval_vars, imgs, gt_boxes, gt_labels, gt_mask, img_size
            )
            logger.info(
                "yolo finetune step %d: mAP50=%.3f mAP50-95=%.3f", i,
                m["map50"], m["map50_95"],
            )
            if val_history is not None:
                val_history.append({"step": i, **m})
    if ema_params is not None:
        variables = {"params": ema_params, "batch_stats": variables["batch_stats"]}
    from tpu3dlm.utils.host import to_host

    return to_host(variables)


def finetune_beit(
    crops_u8: np.ndarray,
    labels: np.ndarray,
    config,
    steps: int = 80,
    lr: float = 1e-3,
    mesh=None,
    seed: int = 0,
    log_every: int = 20,
    augment: dict | bool | None = None,
):
    """Finetune the BEiT damage classifier on labelled crops → params tree.

    ``augment`` — True/kwarg-dict enables in-jit crop augmentation
    (exposure gain/offset jitter spanning the stress-eval range, flip,
    random erase — ops/augment.augment_crop_batch); off by default (the
    pre-round-5 recipe)."""
    import jax
    import jax.numpy as jnp

    from tpu3dlm.models.beit import BeitClassifier
    from tpu3dlm.parallel.finetune import init_finetune, make_beit_train_step
    from tpu3dlm.parallel.mesh import make_mesh

    if len(labels) == 0:
        # training on an empty batch makes loss.mean() NaN and silently
        # writes a NaN checkpoint — fail loudly instead
        raise ValueError(
            "finetune_beit: no labelled crops (ground truth has no 2D "
            "boxes on any in-range frame)"
        )
    # default is a SINGLE-device mesh (the e2e accuracy loop runs on one
    # chip); pass mesh=make_mesh() explicitly for data-parallel training
    mesh = mesh or make_mesh(1)
    n_dev = mesh.devices.size
    # pad by CYCLING the real crops up to a device multiple (keeps every
    # padded slot on-distribution; repeat-then-zero-pad used to append
    # black crops labelled class 0 whenever the repeated length wasn't a
    # device multiple, teaching the classifier that black == undamaged)
    target = -(-max(len(labels), n_dev) // n_dev) * n_dev
    idx = np.arange(target) % len(labels)
    crops_u8 = np.asarray(crops_u8)[idx]
    labels = np.asarray(labels)[idx]

    if augment is True:
        aug_kw = {}
    elif augment is None or augment is False:
        aug_kw = None
    else:
        aug_kw = augment
    beit = BeitClassifier(config)
    params, tx, opt_state = init_finetune(beit, jax.random.PRNGKey(seed), lr=lr)
    step = make_beit_train_step(beit, tx, mesh, augment=aug_kw)
    c, y = jnp.asarray(crops_u8), jnp.asarray(labels)
    base_key = jax.random.PRNGKey(seed + 1)
    for i in range(steps):
        if aug_kw is None:
            params, opt_state, loss = step(params, opt_state, c, y)
        else:
            params, opt_state, loss = step(
                params, opt_state, jax.random.fold_in(base_key, i), c, y
            )
        if log_every and (i % log_every == 0 or i == steps - 1):
            logger.info("beit finetune step %d: loss=%.4f", i, float(loss))
    from tpu3dlm.utils.host import to_host

    return to_host(params)


def finetune_synthetic(
    data_dir: str,
    out_dir: str,
    img_size: int = 96,
    yolo_steps: int = 200,
    yolo_lr: float = 2e-3,
    beit_steps: int = 80,
    beit_lr: float = 1e-3,
    beit_config=None,
    variant: str = "n",
    nc: int = 2,
    mesh=None,
    resize_mode: str = "square",
) -> tuple[str, str]:
    """Train both models from a scan folder's gt.json; write msgpack
    checkpoints (yolo.msgpack, beit.msgpack) into out_dir."""
    from tpu3dlm.data.dataset import load_scan
    from tpu3dlm.data.synthetic import load_scene_gt
    from tpu3dlm.models.beit import BeitConfig
    from tpu3dlm.models.weights import save_flax_checkpoint

    gt = load_scene_gt(os.path.join(data_dir, "gt.json"))
    base = os.path.join(data_dir, "rtabmap_extract")
    scan = load_scan(
        image_dir=os.path.join(base, "data_rgb"),
        depth_image_dir=os.path.join(base, "data_depth"),
        calibration_dir=os.path.join(base, "calibration"),
        pose_path=os.path.join(data_dir, "poses.txt"),
        img_size=img_size,
        resize_mode=resize_mode,
    )

    images, boxes, labels, mask = yolo_training_arrays(gt["gt_boxes_2d"], scan)
    yolo_vars = finetune_yolo(
        images, boxes, labels, mask, nc=nc, img_size=img_size,
        steps=yolo_steps, lr=yolo_lr, variant=variant, mesh=mesh,
    )

    beit_config = beit_config or BeitConfig(num_labels=2)
    crops, dmg = beit_training_crops(
        gt["gt_boxes_2d"], gt["gt_damage_2d"], scan, beit_config.image_size
    )
    beit_params = finetune_beit(
        crops, dmg, beit_config, steps=beit_steps, lr=beit_lr, mesh=mesh
    )

    os.makedirs(out_dir, exist_ok=True)
    yolo_path = os.path.join(out_dir, "yolo.msgpack")
    beit_path = os.path.join(out_dir, "beit.msgpack")
    save_flax_checkpoint(yolo_path, yolo_vars)
    save_flax_checkpoint(beit_path, beit_params)
    logger.info("checkpoints written: %s %s", yolo_path, beit_path)
    return yolo_path, beit_path


if __name__ == "__main__":
    import argparse

    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", required=True, help="scan folder with gt.json")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--img-size", type=int, default=96)
    p.add_argument("--yolo-steps", type=int, default=200)
    p.add_argument("--yolo-lr", type=float, default=2e-3)
    p.add_argument("--beit-steps", type=int, default=80)
    p.add_argument("--beit-lr", type=float, default=1e-3)
    p.add_argument("--variant", default="n")
    p.add_argument("--nc", type=int, default=2)
    args = p.parse_args()
    finetune_synthetic(
        args.data_dir, args.out_dir, img_size=args.img_size,
        yolo_steps=args.yolo_steps, yolo_lr=args.yolo_lr,
        beit_steps=args.beit_steps, beit_lr=args.beit_lr,
        variant=args.variant, nc=args.nc,
    )
