"""3D non-maximum suppression over global bounding boxes.

Replaces the reference's missing ``src/mapper/bbox_optimiser.py::
BoundingBoxProcessor.suppress_bboxes`` (contract at task_def.py:146-148:
same dict-of-frames record shape in and out). The reference maps one
physical sign from many camera frames, so the same object appears as many
near-coincident 3D quads; suppression de-duplicates them, keeping the
highest-confidence instance.

Design (static shapes, one jit):
  1. quality gates hinted by the reference's unused thresholds
     (src/mapper/mapping.py:34-36, 199-206): minimum quad area
     (``area_bbox_min_th``) and minimum camera-to-box distance
     (``cam_to_bbox_min_th``);
  2. each planar quad is extruded ±depth-buffer along its normal
     (Transforms.create_3d_bounding_box semantics) into an ORIENTED box;
  3. pairwise orientation-aware IoU over the top-K boxes by confidence
     (each pair evaluated in the first box's local frame — exact for the
     de-duplication case of equal orientations, and far tighter than world
     AABBs for oblique quads);
  4. greedy suppression by confidence order as a ``lax.fori_loop`` —
     deterministic ties (lower frame index wins).

O(K²) IoU with K a static cap (default 1024) keeps memory bounded
regardless of scan length.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from tpu3dlm.mapper.projection import GlobalBoxes


def _quad_area(corners: jax.Array) -> jax.Array:
    """Area of a planar quad given (4, 3) corners (TL, BL, BR, TR)."""
    d1 = corners[2] - corners[0]
    d2 = corners[3] - corners[1]
    return 0.5 * jnp.linalg.norm(jnp.cross(d1, d2))


def _box_frame(corners: jax.Array, depth_buffer: float):
    """(4, 3) planar quad → oriented box: (R rows = local axes, center,
    half-extents). Corner order TL, BL, BR, TR (ops.geometry.bbox_corners_2d)."""
    u = corners[3] - corners[0]  # width axis
    v = corners[1] - corners[0]  # height axis
    w_len = jnp.linalg.norm(u) + 1e-12
    ux = u / w_len
    v_perp = v - jnp.dot(v, ux) * ux
    h_len = jnp.linalg.norm(v_perp) + 1e-12
    vy = v_perp / h_len
    nz = jnp.cross(ux, vy)
    R = jnp.stack([ux, vy, nz])  # (3, 3) rows
    center = corners.mean(axis=0)
    half = jnp.stack([w_len / 2.0, h_len / 2.0, jnp.asarray(depth_buffer, corners.dtype)])
    return R, center, half


def _pairwise_oriented_iou(
    corners: jax.Array,  # (K, 4, 3) planar quads
    depth_buffer: float,
) -> jax.Array:
    """(K, K) orientation-aware IoU of the extruded boxes.

    Each pair is evaluated in the FIRST box's local frame: that box is
    exact; the other is AABB-projected into the frame (standard OBB extent
    |R_i·R_jᵀ|·h_j). Exact for equal orientations — the de-duplication case
    — and far tighter than global AABBs for oblique quads, which inflate
    world AABBs and over-suppress neighbours. Symmetrised by max.
    """
    R, c, h = jax.vmap(_box_frame, in_axes=(0, None))(corners, depth_buffer)
    # M[i,j] = R_i · R_jᵀ ; extents of box j in box i's frame
    hp = jax.lax.Precision.HIGHEST  # box frames are coordinates (geometry.PRECISE)
    M = jnp.einsum("ikl,jml->ijkm", R, R, precision=hp)
    ext = jnp.einsum("ijkm,jm->ijk", jnp.abs(M), h, precision=hp)  # (K, K, 3)
    ctr = jnp.einsum("ikl,ijl->ijk", R, c[None, :, :] - c[:, None, :],
                     precision=hp)  # (K, K, 3)
    lo = jnp.maximum(-h[:, None, :], ctr - ext)
    hi = jnp.minimum(h[:, None, :], ctr + ext)
    inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
    vol = jnp.prod(2.0 * h, axis=-1)
    iou = inter / jnp.maximum(vol[:, None] + vol[None, :] - inter, 1e-12)
    return jnp.maximum(iou, iou.T)


@partial(
    jax.jit,
    static_argnames=("iou_threshold", "depth_buffer", "area_min", "cam_dist_min", "top_k"),
)
def nms3d_mask(
    corners: jax.Array,  # (F, B, 4, 3)
    conf: jax.Array,  # (F, B)
    mask: jax.Array,  # (F, B)
    cam_positions: jax.Array,  # (F, 3)
    iou_threshold: float = 0.25,
    depth_buffer: float = 0.03,
    area_min: float = 0.001,
    cam_dist_min: float = 0.01,
    top_k: int = 1024,
) -> jax.Array:
    """Returns the (F, B) keep mask after 3D NMS + quality gates."""
    F, B = conf.shape
    N = F * B
    K = min(top_k, N)

    flat_corners = corners.reshape(N, 4, 3)
    flat_conf = conf.reshape(N)
    flat_mask = mask.reshape(N)

    # quality gates
    areas = jax.vmap(_quad_area)(flat_corners)  # (N,)
    cam_pos = jnp.repeat(cam_positions, B, axis=0)  # (N, 3)
    d_cam = jnp.linalg.norm(flat_corners - cam_pos[:, None, :], axis=-1)  # (N, 4)
    too_close = jnp.any(d_cam < cam_dist_min, axis=-1)
    flat_mask = flat_mask & (areas >= area_min) & (~too_close)

    # top-K by confidence (invalid → -inf so they sort last)
    score = jnp.where(flat_mask, flat_conf, -jnp.inf)
    order = jnp.argsort(-score)[:K]  # conf desc, stable → frame order ties
    sel_valid = flat_mask[order]
    iou = _pairwise_oriented_iou(flat_corners[order], depth_buffer)

    idx = jnp.arange(K)
    later = idx[None, :] > idx[:, None]  # j strictly after i in conf order

    def body(i, keep):
        suppress = keep[i] & sel_valid[i] & later[i] & (iou[i] > iou_threshold)
        return keep & ~suppress

    keep_sorted = jax.lax.fori_loop(0, K, body, sel_valid)

    keep_flat = jnp.zeros(N, bool).at[order].set(keep_sorted)
    keep_flat = keep_flat & flat_mask
    return keep_flat.reshape(F, B)


def suppress_bboxes(
    gboxes: GlobalBoxes,
    poses: jax.Array,  # (F, 7)
    iou_threshold: float = 0.25,
    depth_buffer: float = 0.03,
    area_min: float = 0.001,
    cam_dist_min: float = 0.01,
    top_k: int = 1024,
) -> GlobalBoxes:
    """3D NMS over a scan's GlobalBoxes → GlobalBoxes with pruned mask.

    API parity: ``BoundingBoxProcessor(global_bboxes_data, pose_df)
    .suppress_bboxes()`` (reference task_def.py:147-148).

    ``top_k``: static confidence cap on the O(K²) pairwise-IoU suppression —
    candidates beyond it are dropped lowest-confidence first (configurable
    via ``nms_top_k`` in the INI config).
    """
    import logging

    import numpy as np

    from tpu3dlm.utils.host import to_host
    from tpu3dlm.utils.shapes import next_bucket, pad_axis0, pad_poses

    # inputs arrive as host arrays from both producers (fused _finalize and
    # project_detections both end their stage with one batched readback),
    # so the padding below is free numpy; if a caller hands device arrays,
    # the np.asarray inside pad_axis0 still does the right thing.
    # The cap warning counts candidates AFTER the kernel's quality gates
    # (area / camera-distance, numpy twins of _quad_area + the d_cam check)
    # — counting raw masked boxes can claim drops when nothing is capped
    mask_np = np.asarray(gboxes.mask)
    if int(mask_np.sum()) > top_k:
        c = np.asarray(gboxes.corners, np.float32)  # (F, B, 4, 3)
        areas = 0.5 * np.linalg.norm(
            np.cross(c[..., 2, :] - c[..., 0, :], c[..., 3, :] - c[..., 1, :]),
            axis=-1,
        )
        d_cam = np.linalg.norm(
            c - np.asarray(poses, np.float32)[:, None, None, :3], axis=-1
        )
        gated = mask_np & (areas >= area_min) & ~(d_cam < cam_dist_min).any(-1)
        n_candidates = int(gated.sum())
        if n_candidates > top_k:
            logging.getLogger(__name__).warning(
                "3D NMS: %d candidate boxes exceed the top-%d confidence cap "
                "— the lowest-confidence %d are dropped before suppression",
                n_candidates, top_k, n_candidates - top_k,
            )
    # frame axis padded to a bucket (mask=False) so a serving process sees
    # one compiled program per bucket, not one per capture length — padded
    # frames are gated out of the quality checks and can never suppress
    # (score −inf sorts them last and sel_valid keeps their IoU rows inert)
    F = int(np.asarray(gboxes.mask).shape[0])
    Fb = next_bucket(F)
    keep = nms3d_mask(
        jnp.asarray(pad_axis0(gboxes.corners, Fb)),
        jnp.asarray(pad_axis0(gboxes.conf, Fb)),
        jnp.asarray(pad_axis0(gboxes.mask, Fb, fill=False)),
        jnp.asarray(pad_poses(poses, Fb)[:, :3]),
        iou_threshold=iou_threshold,
        depth_buffer=depth_buffer,
        area_min=area_min,
        cam_dist_min=cam_dist_min,
        top_k=top_k,
    )
    # one readback, trim on host (a device [:F] slice would compile per
    # capture length)
    keep = to_host(keep)[:F]
    return dataclasses.replace(gboxes, mask=keep)
