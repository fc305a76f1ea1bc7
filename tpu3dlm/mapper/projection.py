"""Fused 2D→3D bounding-box projection — the reference's hot loop as one jit.

Replaces ``ProcessPose.get_global_coordinates`` (reference
src/mapper/pose_processor.py:88-260): a per-frame Python loop with per-box
list comprehensions and per-corner numpy matmuls becomes a single
``vmap(vmap(...))`` transform over (frames, boxes) that XLA fuses into a
handful of TPU kernels. Complexity O(frames × boxes × depth-pixels) runs as
one device program instead of O(frames × boxes × 4) host round-trips.

Semantics (matching the reference chain):
  1. intrinsics are scaled RGB→depth resolution by image_width/depth_width
     (pose_processor.py:133-137);
  2. each box is rescaled from RGB pixels to depth pixels
     (pose_processor.py:174-178);
  3. the box becomes 4 corner pixels (pose_processor.py:181);
  4. every corner is unprojected with z = median of the valid depth values
     over the box region, in metres (z mm / scale_depth)
     (pose_processor.py:184-196 — `_depth_to_3d` "median over bbox range");
  5. camera-frame corners are mapped to world via the pose matrix
     (pose_processor.py:199-201, 242-260).

Output record semantics match the reference: 4 global corners +
[damage, conf, label] per box (pose_processor.py:208), with a static-shape
validity mask instead of ragged lists.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tpu3dlm.data.scan import Detections, Scan
from tpu3dlm.ops import geometry as G


def frame_view_geometry(
    scan: Scan,
    gboxes: "GlobalBoxes",
    frame_index: int,
    depth_buffer: float = 0.03,
    frustum_depth: float = 0.3,
) -> dict:
    """Dependency-free geometry for the reference's live 3D display during
    projection (pose_processor.py:144-171 RGBD cloud + :219-238 box line
    sets and camera-frustum overlay):

      * ``cloud_points`` (N, 3) world-frame points of this frame's depth
        map (geometry only — colorize via Visualiser.gen_point_cloud);
      * ``boxes``: list of (8, 3) extruded box corners for the frame's
        valid detections;
      * ``frustum``: {points (5, 3), lines} camera frustum for the pose.

    An Open3D viewer (utils/visualisation.Visualiser) can consume this
    directly; tests assert the geometry itself.
    """
    from tpu3dlm.ops.pointcloud import depth_to_points
    from tpu3dlm.utils.visualisation import Visualiser

    depth = jnp.asarray(scan.depth)[frame_index]
    wh = np.asarray(scan.rgb_size, np.float32)[frame_index]
    fx, fy, cx, cy = np.asarray(scan.intrinsics, np.float32)[frame_index]
    fx_d, fy_d, cx_d, cy_d = G.scale_intrinsics(
        fx, fy, cx, cy, wh[0], depth.shape[1]
    )
    pose = np.asarray(scan.poses, np.float32)[frame_index]

    pts, valid = depth_to_points(depth, fx_d, fy_d, cx_d, cy_d, pose=jnp.asarray(pose))
    pts = np.asarray(pts)[np.asarray(valid)]

    boxes = []
    mask = np.asarray(gboxes.mask)[frame_index]
    corners = np.asarray(gboxes.corners)[frame_index]
    for b in range(mask.shape[0]):
        if mask[b]:
            boxes.append(
                np.asarray(
                    G.create_3d_bounding_box(jnp.asarray(corners[b]), depth_buffer)
                )
            )

    T = np.asarray(G.pose_to_matrix(jnp.asarray(pose)))
    frustum = Visualiser()._overlay_camera_frustum(
        T[:3, 3], T[:3, :3], fx_d, fy_d, depth.shape[1], depth.shape[0],
        depth=frustum_depth,
    )
    if not isinstance(frustum, dict):  # Open3D LineSet → plain geometry
        frustum = {
            "points": np.asarray(frustum.points),
            "lines": [list(map(int, l)) for l in np.asarray(frustum.lines)],
        }
    return {"cloud_points": pts, "boxes": boxes, "frustum": frustum}


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GlobalBoxes:
    """Padded per-frame global 3D boxes (4 planar corners each)."""

    corners: Any  # (F, B, 4, 3) float32 — world-frame quad corners
    damage: Any  # (F, B) int32
    conf: Any  # (F, B) float32
    label: Any  # (F, B) int32
    mask: Any  # (F, B) bool — valid box AND valid median depth

    def to_frame_dict(self) -> dict[int, list[list]]:
        """Reference record shape: {frame: [[c0, c1, c2, c3, dmg, conf, label]]}
        with each corner a length-3 ndarray (pose_processor.py:208)."""
        from tpu3dlm.utils.host import to_host

        corners, damage, conf, label, mask = to_host(
            (self.corners, self.damage, self.conf, self.label, self.mask)
        )
        out: dict[int, list[list]] = {}
        for f in range(corners.shape[0]):
            rows = []
            for b in range(corners.shape[1]):
                if mask[f, b]:
                    rows.append(
                        [corners[f, b, i] for i in range(4)]
                        + [int(damage[f, b]), float(conf[f, b]), int(label[f, b])]
                    )
            out[f] = rows
        return out


def _project_one_box(
    bbox: jax.Array,  # (4,) x1,y1,x2,y2 in RGB pixels
    box_valid: jax.Array,  # () bool
    depth: jax.Array,  # (Hd, Wd) float32 mm
    intrinsics: jax.Array,  # (4,) fx, fy, cx, cy at RGB resolution
    rgb_size: jax.Array,  # (2,) width, height
    pose: jax.Array,  # (7,)
    scale_depth: float,
    median_samples: int = 32,
) -> tuple[jax.Array, jax.Array]:
    """One box → (4, 3) world corners + validity."""
    hd, wd = depth.shape
    depth_wh = jnp.array([wd, hd], dtype=bbox.dtype)

    fx, fy, cx, cy = G.scale_intrinsics(
        intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3],
        rgb_size[0], depth_wh[0],
    )

    scaled = G.scale_bbox(bbox, rgb_size, depth_wh)
    # sampled median: exact on planar sign regions, ~50× cheaper than the
    # full-image sort the exact median needs (see ops/geometry.py)
    z_mm, z_valid = G.bbox_sampled_median_depth(
        depth, scaled, samples=median_samples
    )
    z = z_mm / scale_depth  # mm → metres

    corners = G.bbox_corners_2d(scaled)  # (4, 2)
    cam_pts = G.unproject(corners[:, 0], corners[:, 1], z, fx, fy, cx, cy)

    T = G.pose_to_matrix(pose)
    world = G.transform_points(T, cam_pts)
    return world, box_valid & z_valid


@partial(jax.jit, static_argnames=("scale_depth", "median_samples"))
def project_boxes(
    boxes: jax.Array,  # (F, B, 4)
    box_mask: jax.Array,  # (F, B)
    depth: jax.Array,  # (F, Hd, Wd)
    intrinsics: jax.Array,  # (F, 4)
    rgb_size: jax.Array,  # (F, 2)
    poses: jax.Array,  # (F, 7)
    scale_depth: float = 1000.0,
    median_samples: int = 32,
) -> tuple[jax.Array, jax.Array]:
    """Fused kernel: all frames × boxes → ((F, B, 4, 3) corners, (F, B) mask).

    ``median_samples``: side of the depth-median sampling grid (see
    bbox_sampled_median_depth). ANY grid size is exact on piecewise-
    constant (planar-sign) regions — the workload's case. The LIBRARY
    default stays 32 (the round-2..4 numerics, the denser median for noisy
    real depth); the serving/bench entrypoints pass 16 explicitly
    (project_detections, parallel/inference.full_scan_step_fn, bench.py) —
    a 256-sample median that quarters the per-box sort which dominated the
    projection stage (v5e-1 per-op ledger, PERF.md round-5: sort 8.0% of
    device time at 32x32; 16x16 measured +13.5% end-to-end detect+project
    throughput, placement gates unchanged).
    """
    project = partial(_project_one_box, median_samples=median_samples)
    per_frame = jax.vmap(  # over boxes within a frame
        project, in_axes=(0, 0, None, None, None, None, None)
    )
    all_frames = jax.vmap(  # over frames
        per_frame, in_axes=(0, 0, 0, 0, 0, 0, None)
    )
    return all_frames(
        boxes.astype(jnp.float32),
        box_mask,
        depth,
        intrinsics.astype(jnp.float32),
        rgb_size.astype(jnp.float32),
        poses.astype(jnp.float32),
        scale_depth,
    )


def project_detections(
    scan: Scan, det: Detections, scale_depth: float = 1000.0,
    median_samples: int = 16,
) -> GlobalBoxes:
    """Scan + 2D Detections → GlobalBoxes (world-frame quads).

    ``median_samples`` defaults to the SERVING grid (16 — see
    project_boxes: this entrypoint is the pipeline's staged path, measured
    at +13.5% step throughput with placement gates unchanged); the raw
    kernel's library default stays 32.

    The frame axis is padded to a bucket (utils/shapes) so captures of
    different lengths reuse one compiled program in a long-lived serving
    process; padded frames carry ``mask=False`` and zero depth (their
    sampled median is invalid), so they contribute nothing."""
    from tpu3dlm.utils.shapes import next_bucket, pad_axis0, pad_poses

    from tpu3dlm.utils.host import to_host

    F = int(np.asarray(det.mask).shape[0])
    Fb = next_bucket(F)
    poses_p = pad_poses(scan.poses, Fb)
    corners, mask = project_boxes(
        jnp.asarray(pad_axis0(det.boxes, Fb)),
        jnp.asarray(pad_axis0(det.mask, Fb, fill=False)),
        jnp.asarray(pad_axis0(scan.depth, Fb)),
        jnp.asarray(pad_axis0(scan.intrinsics, Fb, fill=1)),
        jnp.asarray(pad_axis0(scan.rgb_size, Fb, fill=1)),
        jnp.asarray(poses_p),
        scale_depth=scale_depth,
        median_samples=median_samples,
    )
    # stage boundary goes to host in ONE batched readback (the fused path's
    # _finalize does the same); trimming the bucket on device would compile
    # a tiny slice program per capture length, and downstream (3D NMS →
    # records) pads/consumes host arrays anyway
    corners, mask = to_host((corners, mask))
    return GlobalBoxes(
        corners=corners[:F],
        damage=np.asarray(det.damage),
        conf=np.asarray(det.conf),
        label=np.asarray(det.label),
        mask=mask[:F],
    )


if __name__ == "__main__":  # standalone resume harness (reference
    # src/mapper/pose_processor.py:274-320: load pickle → project → write back)
    import argparse
    import os
    import pickle

    from tpu3dlm.data.dataset import load_scan
    from tpu3dlm.data.scan import detections_from_frame_dict
    from tpu3dlm.utils.config import ConfigLoader

    parser = argparse.ArgumentParser(description="Processing Configuration")
    parser.add_argument("--data", type=str, default="gold_std")
    parser.add_argument("--config", type=str, default=os.path.join("configs", "variables.cfg"))
    args = parser.parse_args()
    cfg = ConfigLoader(args.config, args.data)

    with open(cfg.pickle_path, "rb") as f:
        variables = pickle.load(f)
    scan = load_scan(cfg.image_dir, cfg.depth_image_dir, cfg.calibration_dir,
                     cfg.pose_path, img_size=cfg.img_size,
                     depth_width=cfg.depth_width, depth_height=cfg.depth_height)
    det = detections_from_frame_dict(variables["predictions"], scan.num_frames)
    gboxes = project_detections(scan, det)
    variables["global_bboxes_data"] = gboxes.to_frame_dict()
    with open(cfg.pickle_path, "wb") as f:
        pickle.dump(variables, f)
    print(f"projected {int(np.asarray(gboxes.mask).sum())} boxes → {cfg.pickle_path}")
