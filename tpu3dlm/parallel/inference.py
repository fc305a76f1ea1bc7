"""Data-parallel full-scan inference: the whole perception+mapping step as
one jitted program sharded over the frame axis.

This is the multi-chip form of BASELINE config 2/5 (SURVEY.md §2c: the
framework capability the reference lacks): frames shard over the ``batch``
mesh axis, model params replicate, and XLA partitions the fused
detect → rectify → classify → project program with no host round-trips
between stages.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu3dlm.models.beit import BeitClassifier, preprocess_crops
from tpu3dlm.models.yolov10 import YOLOv10, postprocess
from tpu3dlm.ops.image import _rectify_one_mxu
from tpu3dlm.mapper.projection import project_boxes


def full_scan_step_fn(
    yolo: YOLOv10,
    beit: BeitClassifier,
    img_size: int,
    max_det: int,
    conf_thresh: float,
    crop_budget: int = 128,
    mesh: Mesh | None = None,
):
    """Builds the pure per-shard function: (params, frame-batch) → results.

    All inputs/outputs have a leading frame axis, so sharding it over the
    mesh data-parallelises the whole step.

    ``crop_budget``: BEiT classifies only the top-`crop_budget` crops by
    detection confidence across the shard (static shape) instead of all
    F×max_det padded slots — the classifier is the FLOPs giant of the step
    (BEiT-base ≈ 17 GFLOPs/crop vs YOLOv10-n ≈ 7 GFLOPs/frame), and real
    scans have far fewer confident boxes than padding slots.

    ``box_affine`` (F, 4) [sx, sy, px, py] is the original→detector pixel
    map (x_det = x·sx + px); plain square resize is [S/w, S/h, 0, 0] and an
    ultralytics-style letterbox is [s, s, pad_x, pad_y], so letterboxed
    scans (what converted finetuned checkpoints expect,
    data/dataset.py:150-156) run through the same fused program.

    ``mesh``: when set AND the BEiT attention resolves to the Pallas
    kernel, the classify sub-call runs under ``shard_map`` over the crop
    axis. This is what keeps the fused kernel (ops/pallas/attention.py)
    usable on a multi-chip mesh: GSPMD treats a ``pallas_call`` as opaque
    and would REPLICATE it (all-gather its operands), but inside shard_map
    each device runs the per-shard program — kernel included — on its
    local crops. Everything else in the step stays GSPMD-partitioned
    (including the global crop top-k). When the attention resolves to the
    einsum path (non-TPU backends, f32), the wrap is SKIPPED: GSPMD
    partitions einsums cleanly, and the wrap's crop reshard costs real
    time for no benefit (measured 1.9× on the 8-device CPU-mesh strong-
    scaling leg).
    """
    classify = lambda bv, crops: beit.apply(bv, preprocess_crops(crops))  # noqa: E731
    if mesh is not None:
        from tpu3dlm.models.beit import resolve_attn_impl

        if resolve_attn_impl(beit.cfg, beit.dtype) != "pallas":
            mesh = None  # einsum path: plain GSPMD partitioning
    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as _P

        axis = mesh.axis_names[0]
        classify_shard = shard_map(
            classify,
            mesh=mesh,
            in_specs=(_P(), _P(axis)),
            out_specs=_P(axis),
            check_vma=False,  # pallas_call has no replication rule
        )

        def classify(bv, crops):  # noqa: F811 — shard_map-wrapped twin
            kk = crops.shape[0]
            pad = (-kk) % mesh.devices.size
            if pad:
                crops = jnp.pad(crops, ((0, pad), (0, 0), (0, 0), (0, 0)))
            return classify_shard(bv, crops)[:kk]

    def step(
        yolo_vars, beit_vars, rgb_u8, depth, intrinsics, rgb_size, poses, box_affine
    ):
        x = rgb_u8.astype(jnp.float32) / 255.0
        # split head output → XLA DCEs the box/cls concat (PERF.md r4)
        raw = yolo.apply(yolo_vars, x)["one2one_split"]
        det = postprocess(raw, img_size=img_size, max_det=max_det)
        boxes_sq = det["boxes"]  # (F, D, 4) in detector pixels
        mask = det["conf"] >= conf_thresh

        size = beit.cfg.image_size
        F, D = boxes_sq.shape[0], boxes_sq.shape[1]

        # detector pixels → original pixels (inverse of box_affine), clipped
        # to the frame — letterbox pads can land boxes outside the content
        sx = box_affine[:, None, 0]
        sy = box_affine[:, None, 1]
        px = box_affine[:, None, 2]
        py = box_affine[:, None, 3]
        w = rgb_size[:, None, 0]
        h = rgb_size[:, None, 1]
        boxes_px = jnp.stack(
            [
                jnp.clip((boxes_sq[..., 0] - px) / sx, 0.0, w),
                jnp.clip((boxes_sq[..., 1] - py) / sy, 0.0, h),
                jnp.clip((boxes_sq[..., 2] - px) / sx, 0.0, w),
                jnp.clip((boxes_sq[..., 3] - py) / sy, 0.0, h),
            ],
            axis=-1,
        )
        # clipped boxes back in detector pixels — the crop source (keeps the
        # staged and fused paths byte-identical on edge boxes)
        boxes_rect = jnp.stack(
            [
                boxes_px[..., 0] * sx + px,
                boxes_px[..., 1] * sy + py,
                boxes_px[..., 2] * sx + px,
                boxes_px[..., 3] * sy + py,
            ],
            axis=-1,
        )

        # select the crop budget FIRST, then rectify only those k crops —
        # both the MXU resample and BEiT scale with k, not F×D
        k = min(crop_budget, F * D)
        flat_conf = jnp.where(mask, det["conf"], -1.0).reshape(F * D)
        top_conf, top_idx = jax.lax.top_k(flat_conf, k)
        frame_idx = top_idx // D
        sel_boxes = boxes_rect.reshape(F * D, 4)[top_idx]
        sel_frames = x[frame_idx]  # (k, S, S, 3)
        sel_crops = jax.vmap(_rectify_one_mxu, in_axes=(0, 0, None))(
            sel_frames, sel_boxes, (size, size)
        )
        sel = (sel_crops * 255.0).astype(jnp.uint8)
        logits = classify(beit_vars, sel)
        ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        damage = (
            jnp.full((F * D,), -1, jnp.int32)
            .at[top_idx]
            .set(jnp.where(top_conf >= conf_thresh, ids, -1))
            .reshape(F, D)
        )
        corners, valid = project_boxes(
            boxes_px, mask, depth, intrinsics, rgb_size, poses,
            # serving grid (library default is 32 — see project_boxes)
            median_samples=16,
        )
        return {
            "boxes": boxes_px,
            "conf": det["conf"],
            "label": det["label"],
            "damage": damage,
            "mask": valid,
            "corners": corners,
        }

    return step


def sharded_full_scan_step(
    mesh: Mesh,
    yolo: YOLOv10,
    beit: BeitClassifier,
    img_size: int,
    max_det: int = 32,
    conf_thresh: float = 0.25,
    crop_budget: int = 128,
):
    """jit the full scan step with frame-axis sharding over the mesh.

    NOTE: the crop top-k inside the step runs per shard under jit's SPMD
    partitioning — XLA keeps the selection consistent with the global
    result because the step is written over the full (sharded) frame axis.
    The BEiT classify sub-call runs under shard_map (see full_scan_step_fn)
    so the fused Pallas attention kernel partitions over the mesh instead
    of forcing a fallback to the einsum path.
    """
    step = full_scan_step_fn(
        yolo, beit, img_size, max_det, conf_thresh, crop_budget, mesh=mesh
    )
    b = P(mesh.axis_names[0])
    rep = NamedSharding(mesh, P())
    sb = NamedSharding(mesh, b)
    return jax.jit(
        step,
        in_shardings=(rep, rep, sb, sb, sb, sb, sb, sb),
        out_shardings=sb,
    )


def square_box_affine(rgb_size, img_size: int):
    """(F, 2) original w/h → (F, 4) [sx, sy, 0, 0] square-resize affine."""
    import numpy as np

    wh = np.asarray(rgb_size, np.float32)
    z = np.zeros(len(wh), np.float32)
    return np.stack([img_size / wh[:, 0], img_size / wh[:, 1], z, z], axis=-1)
