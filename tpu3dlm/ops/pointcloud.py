"""RGBD → point cloud as a fused JAX unprojection.

Replaces Open3D's create_from_rgbd_image path (reference
src/mapper/pose_processor.py:262-271 via Visualiser.gen_rgbd/gen_point_cloud):
every depth pixel unprojects through the pinhole model and transforms to the
world frame in one vmapped program — (F, Hd, Wd) depth maps become
(F, Hd·Wd, 3) clouds with validity masks, on device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tpu3dlm.ops import geometry as G


def depth_to_points(
    depth: jax.Array,  # (H, W) float32, in `scale_depth` units (mm by default)
    fx, fy, cx, cy,
    pose: jax.Array | None = None,  # (7,) camera→world; None = camera frame
    scale_depth: float = 1000.0,
) -> tuple[jax.Array, jax.Array]:
    """One depth map → ((H·W, 3) points, (H·W,) valid mask)."""
    h, w = depth.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    z = depth / scale_depth
    pts = G.unproject(xs, ys, z, fx, fy, cx, cy).reshape(-1, 3)
    valid = (depth > 1e-6).reshape(-1)
    if pose is not None:
        T = G.pose_to_matrix(pose)
        pts = G.transform_points(T, pts)
    return pts, valid


@partial(jax.jit, static_argnames=("scale_depth",))
def scan_to_pointcloud(
    depth: jax.Array,  # (F, H, W)
    intrinsics: jax.Array,  # (F, 4) fx, fy, cx, cy at RGB resolution
    rgb_size: jax.Array,  # (F, 2)
    poses: jax.Array,  # (F, 7)
    scale_depth: float = 1000.0,
) -> tuple[jax.Array, jax.Array]:
    """Whole scan → ((F, H·W, 3) world points, (F, H·W) valid)."""
    def one(d, intr, wh, pose):
        s = wh[0] / d.shape[1]
        return depth_to_points(
            d, intr[0] / s, intr[1] / s, intr[2] / s, intr[3] / s,
            pose=pose, scale_depth=scale_depth,
        )

    return jax.vmap(one)(depth, intrinsics.astype(jnp.float32),
                         rgb_size.astype(jnp.float32), poses.astype(jnp.float32))
