"""YOLOv10 detection loss: task-aligned assignment + CIoU + DFL, pure JAX.

The reference consumes a *finetuned* YOLOv10 (src/detector/detector.py:36)
but has no training code; this module provides the finetuning capability
natively. It implements the consistent-dual-assignment recipe of the
YOLOv10 paper: the one-to-many head trains with TAL top-k=10, the one-to-one
head (used NMS-free at inference) with top-k=1 on DETACHED backbone
features (models/yolov10.py stop-gradients the one-to-one branch's input
during training, matching the official recipe — only the one-to-many loss
shapes the backbone).

Everything is fixed-shape: ground-truth boxes are padded to a static G per
image with a validity mask, the (B, G, A) assignment tensors stay on device,
and the whole loss is one differentiable jit — no host-side assignment loop.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from tpu3dlm.models.yolov10 import REG_MAX, make_anchors


def pairwise_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """IoU between (..., 4) xyxy boxes (broadcasting)."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    inter = jnp.prod(jnp.maximum(rb - lt, 0.0), axis=-1)
    area_a = jnp.prod(jnp.maximum(a[..., 2:] - a[..., :2], 0.0), axis=-1)
    area_b = jnp.prod(jnp.maximum(b[..., 2:] - b[..., :2], 0.0), axis=-1)
    return inter / jnp.maximum(area_a + area_b - inter, 1e-9)


def ciou(a: jax.Array, b: jax.Array) -> jax.Array:
    """Complete IoU between (..., 4) xyxy boxes."""
    iou = pairwise_iou(a, b)
    ctr_a = (a[..., :2] + a[..., 2:]) / 2
    ctr_b = (b[..., :2] + b[..., 2:]) / 2
    rho2 = jnp.sum((ctr_a - ctr_b) ** 2, axis=-1)
    lt = jnp.minimum(a[..., :2], b[..., :2])
    rb = jnp.maximum(a[..., 2:], b[..., 2:])
    diag2 = jnp.sum((rb - lt) ** 2, axis=-1) + 1e-9
    wa = jnp.maximum(a[..., 2] - a[..., 0], 1e-9)
    ha = jnp.maximum(a[..., 3] - a[..., 1], 1e-9)
    wb = jnp.maximum(b[..., 2] - b[..., 0], 1e-9)
    hb = jnp.maximum(b[..., 3] - b[..., 1], 1e-9)
    v = (4 / jnp.pi**2) * (jnp.arctan(wb / hb) - jnp.arctan(wa / ha)) ** 2
    alpha = v / jnp.maximum(1.0 - iou + v, 1e-9)
    return iou - rho2 / diag2 - jax.lax.stop_gradient(alpha) * v


def task_aligned_assign(
    pred_scores: jax.Array,  # (B, A, nc) sigmoid probs
    pred_boxes: jax.Array,  # (B, A, 4) xyxy px
    anchors_px: jax.Array,  # (A, 2) anchor centres in px
    gt_boxes: jax.Array,  # (B, G, 4) xyxy px
    gt_labels: jax.Array,  # (B, G) int32
    gt_mask: jax.Array,  # (B, G) bool
    top_k: int,
    alpha: float = 0.5,
    beta: float = 6.0,
):
    """TAL: returns (target_boxes (B,A,4), target_scores (B,A,nc), fg (B,A)).

    metric = score^alpha · IoU^beta over anchors whose centre lies inside the
    gt box; each gt keeps its top-k anchors; anchor conflicts resolve to the
    gt with the highest IoU. Class targets are the normalised metric
    (soft targets), boxes the assigned gt box.
    """
    B, A, nc = pred_scores.shape
    G = gt_boxes.shape[1]

    iou = pairwise_iou(gt_boxes[:, :, None, :], pred_boxes[:, None, :, :])  # (B,G,A)
    cls_score = jnp.take_along_axis(
        pred_scores.transpose(0, 2, 1),  # (B, nc, A)
        jnp.maximum(gt_labels, 0)[:, :, None],  # (B, G, 1)
        axis=1,
    )  # (B, G, A)
    metric = (cls_score**alpha) * (jnp.maximum(iou, 0.0) ** beta)

    inside = (
        (anchors_px[None, None, :, 0] >= gt_boxes[..., 0:1])
        & (anchors_px[None, None, :, 0] <= gt_boxes[..., 2:3])
        & (anchors_px[None, None, :, 1] >= gt_boxes[..., 1:2])
        & (anchors_px[None, None, :, 1] <= gt_boxes[..., 3:4])
    )  # (B, G, A)
    metric = jnp.where(inside & gt_mask[..., None], metric, 0.0)

    # top-k anchors per gt
    k = min(top_k, A)
    topv, topi = jax.lax.top_k(metric, k)  # (B, G, k)
    sel = jnp.zeros((B, G, A), bool)
    sel = sel.at[
        jnp.arange(B)[:, None, None], jnp.arange(G)[None, :, None], topi
    ].set(topv > 0)

    # conflicts: an anchor claimed by several gts goes to the highest-IoU gt
    claim_iou = jnp.where(sel, iou, -1.0)  # (B, G, A)
    best_gt = jnp.argmax(claim_iou, axis=1)  # (B, A)
    best_iou = jnp.max(claim_iou, axis=1)  # (B, A)
    fg = best_iou > -0.5  # anchor selected by at least one gt

    t_boxes = jnp.take_along_axis(gt_boxes, best_gt[..., None], axis=1)  # (B, A, 4)
    t_labels = jnp.take_along_axis(gt_labels, best_gt, axis=1)  # (B, A)
    # metric of the assigned (gt, anchor) pair
    pair_metric = jnp.squeeze(
        jnp.take_along_axis(metric.transpose(0, 2, 1), best_gt[..., None], axis=2), -1
    )  # (B, A)

    # normalise: target score = metric / max_metric(gt) * max_iou(gt)
    max_metric = jnp.max(metric, axis=2)  # (B, G)
    max_iou = jnp.max(jnp.where(sel, iou, 0.0), axis=2)  # (B, G)
    norm = max_iou / jnp.maximum(max_metric, 1e-9)  # (B, G)
    norm_a = jnp.take_along_axis(norm, best_gt, axis=1)  # (B, A)
    t_score_val = jnp.where(fg, pair_metric * norm_a, 0.0)
    t_score_val = jnp.clip(t_score_val, 0.0, 1.0)

    target_scores = (
        jax.nn.one_hot(t_labels, pred_scores.shape[-1], dtype=pred_scores.dtype)
        * t_score_val[..., None]
    )
    return t_boxes, target_scores, fg


def _dfl_loss(box_logits: jax.Array, target_ltrb: jax.Array) -> jax.Array:
    """Distribution focal loss over the two bins bracketing each target
    distance. box_logits (..., 4, REG_MAX); target_ltrb (..., 4) in
    [0, REG_MAX-1]."""
    t = jnp.clip(target_ltrb, 0.0, REG_MAX - 1 - 1e-3)
    tl = jnp.floor(t)
    wr = t - tl
    wl = 1.0 - wr
    logp = jax.nn.log_softmax(box_logits, axis=-1)
    tl_i = tl.astype(jnp.int32)
    lp_l = jnp.take_along_axis(logp, tl_i[..., None], axis=-1)[..., 0]
    lp_r = jnp.take_along_axis(logp, (tl_i + 1)[..., None], axis=-1)[..., 0]
    return -(wl * lp_l + wr * lp_r).mean(axis=-1)  # mean over the 4 sides


def detection_loss_one_head(
    raw: Sequence[jax.Array],  # per-scale (B, H, W, 4*REG_MAX + nc)
    gt_boxes: jax.Array,
    gt_labels: jax.Array,
    gt_mask: jax.Array,
    img_size: int,
    top_k: int,
    w_box: float = 7.5,
    w_cls: float = 0.5,
    w_dfl: float = 1.5,
) -> jax.Array:
    from tpu3dlm.models.yolov10 import decode_raw

    B = raw[0].shape[0]
    pred_boxes, cls_logits = decode_raw(raw, img_size)  # (B,A,4), (B,A,nc)
    pred_scores = jax.nn.sigmoid(cls_logits)
    anchors, strides = make_anchors(img_size)
    anchors_px = anchors * strides[:, None]

    t_boxes, t_scores, fg = task_aligned_assign(
        jax.lax.stop_gradient(pred_scores),
        jax.lax.stop_gradient(pred_boxes),
        anchors_px, gt_boxes, gt_labels, gt_mask, top_k,
    )

    denom = jnp.maximum(t_scores.sum(), 1.0)

    # classification: BCE against soft targets, all anchors
    import optax

    cls_loss = (
        optax.sigmoid_binary_cross_entropy(cls_logits, t_scores).sum() / denom
    )

    # box: CIoU on fg anchors, weighted by target score
    w = t_scores.sum(-1) * fg  # (B, A)
    box_loss = ((1.0 - ciou(pred_boxes, t_boxes)) * w).sum() / denom

    # DFL on fg anchors: target ltrb distances in stride units
    flat = jnp.concatenate([r.reshape(B, -1, r.shape[-1]) for r in raw], axis=1)
    box_logits = flat[..., : 4 * REG_MAX].reshape(B, -1, 4, REG_MAX)
    lt = (anchors_px - t_boxes[..., :2]) / strides[None, :, None]
    rb = (t_boxes[..., 2:] - anchors_px) / strides[None, :, None]
    target_ltrb = jnp.concatenate([lt, rb], axis=-1)
    dfl = (_dfl_loss(box_logits, target_ltrb) * w).sum() / denom

    return w_box * box_loss + w_cls * cls_loss + w_dfl * dfl


def yolov10_loss(
    outputs: dict,
    gt_boxes: jax.Array,
    gt_labels: jax.Array,
    gt_mask: jax.Array,
    img_size: int,
) -> jax.Array:
    """Consistent dual assignment: one-to-many (top-k 10) + one-to-one (top-k 1)."""
    l_o2m = detection_loss_one_head(
        outputs["one2many"], gt_boxes, gt_labels, gt_mask, img_size, top_k=10
    )
    l_o2o = detection_loss_one_head(
        outputs["one2one"], gt_boxes, gt_labels, gt_mask, img_size, top_k=1
    )
    return l_o2m + l_o2o
