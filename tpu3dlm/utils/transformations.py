"""Transforms — host-side API parity with the snapshot-missing
``src/utils/transformations.py::Transforms`` (contract: SURVEY.md §2b).

Thin numpy adapters over the canonical JAX implementations in
ops/geometry.py; device code should use ops.geometry directly — this class
exists so code written against the reference's API drops in unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tpu3dlm.ops import geometry as G


class Transforms:
    def get_transformation_matrix(self, pose_data) -> np.ndarray:
        """[tx,ty,tz,qx,qy,qz,qw] → 4×4 camera→world (pose_processor.py:140)."""
        return np.asarray(G.pose_to_matrix(jnp.asarray(pose_data, jnp.float32)))

    def get_translation(self, pose_data) -> np.ndarray:
        return np.asarray(pose_data, np.float32)[:3]

    def get_rotation(self, pose_data) -> np.ndarray:
        return np.asarray(G.quat_to_rotmat(jnp.asarray(pose_data, jnp.float32)[3:7]))

    def get_camera_direction(self, pose_df) -> np.ndarray:
        """(F, 3) unit view directions for a pose table (mapping.py:187)."""
        poses = (
            pose_df[["tx", "ty", "tz", "qx", "qy", "qz", "qw"]].to_numpy()
            if hasattr(pose_df, "columns")
            else np.asarray(pose_df)
        )
        import jax

        return np.asarray(
            jax.vmap(G.camera_direction)(jnp.asarray(poses, jnp.float32))
        )

    def scale_bounding_box(self, bbox, from_wh, to_wh):
        return np.asarray(
            G.scale_bbox(
                jnp.asarray(bbox[:4], jnp.float32),
                jnp.asarray(from_wh, jnp.float32),
                jnp.asarray(to_wh, jnp.float32),
            )
        ).tolist() + list(bbox[4:])

    def bbox_to_3d(self, scaled_bbox, img_size=None):
        """[x1,y1,x2,y2,...] → 4 corner (x, y) pixels (pose_processor.py:181)."""
        return np.asarray(
            G.bbox_corners_2d(jnp.asarray(scaled_bbox[:4], jnp.float32))
        )

    def _depth_to_3d(self, x, y, depth_img, fx, fy, cx, cy, scale_depth):
        """Corner pixel → camera-frame (X, Y, Z) at that pixel's depth/scale.

        (The pipeline's fused path uses the bbox-median depth — see
        mapper/projection.py; this per-pixel form matches the call signature
        at pose_processor.py:184-196.)"""
        z = float(np.asarray(depth_img)[int(y), int(x)]) / scale_depth
        return np.array([(x - cx) * z / fx, (y - cy) * z / fy, z], np.float32)

    def create_3d_bounding_box(self, corners4, depth_buffer):
        return np.asarray(
            G.create_3d_bounding_box(
                jnp.asarray(np.stack([np.asarray(c) for c in corners4]), jnp.float32),
                float(depth_buffer),
            )
        )
