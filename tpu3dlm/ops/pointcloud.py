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


def estimate_normals_grid(
    points,  # (N, 3)
    voxel: float = 0.08,
    viewpoint=None,  # orient normals towards this point when given
):
    """Per-point unit normals from per-voxel PCA (host numpy).

    Replaces the reference's Open3D KDTree-hybrid normal estimation
    (src/mapper/mapping.py:123-128) without the dependency: points bin into
    `voxel`-sized cells, each cell's 3×3 covariance accumulates via
    scatter-add, a batched eigendecomposition gives the smallest-eigenvalue
    direction, and every point inherits its cell's normal. One O(N) pass +
    one batched 3×3 eigh — no tree, no per-point neighbourhood search.
    Cells with < 3 points fall back to the global dominant-plane normal.

    Prefers the native C++ core (tpu3dlm/native/src/normals.cpp — one
    hash-accumulate pass, analytic 3×3 eigensolve); this numpy path is the
    toolchain-free fallback.
    """
    import numpy as np

    from tpu3dlm.native import native_grid_normals

    native = native_grid_normals(points, voxel, viewpoint)
    if native is not None:
        return native

    pts = np.asarray(points, np.float64)
    n = pts.shape[0]
    if n == 0:
        # cells.min below would raise a zero-size reduction error; the
        # later n-guards never get the chance to run
        return np.zeros((0, 3), np.float32)
    cells = np.floor(pts / voxel).astype(np.int64)
    cells -= cells.min(axis=0)
    dims = cells.max(axis=0) + 1
    # flat int64 cell key: unique on a 1-D array is ~10× faster than the
    # row-wise unique(axis=0) lexsort on million-point clouds
    key = (cells[:, 0] * dims[1] + cells[:, 1]) * dims[2] + cells[:, 2]
    _, inv = np.unique(key, return_inverse=True)
    v = int(inv.max()) + 1 if n else 0

    counts = np.bincount(inv, minlength=v).astype(np.float64)
    c1 = np.maximum(counts, 1)
    sums = np.zeros((v, 3))
    for k in range(3):
        sums[:, k] = np.bincount(inv, weights=pts[:, k], minlength=v)
    means = sums / c1[:, None]
    # single-pass covariance E[xyᵀ] − μμᵀ (no per-point mean gather): the
    # cancellation loses ~|x|²·eps ≈ 1e-15 m² in f64 against a within-cell
    # variance of ~voxel²/12 — negligible at any sane voxel size.
    cov = np.zeros((v, 3, 3))
    for a in range(3):
        for b in range(a, 3):
            cab = np.bincount(inv, weights=pts[:, a] * pts[:, b], minlength=v) / c1
            cab -= means[:, a] * means[:, b]
            cov[:, a, b] = cab
            cov[:, b, a] = cab

    # batched 3×3 eigh: smallest eigenvector = plane normal
    _, vecs = np.linalg.eigh(cov + 1e-12 * np.eye(3))
    normals_v = vecs[:, :, 0]
    # degenerate cells (too few points) → global dominant-plane normal
    bad = counts < 3
    if bad.any():
        if n >= 3:
            _, gv = np.linalg.eigh(np.cov(pts.T) + 1e-12 * np.eye(3))
            normals_v[bad] = gv[:, 0]
        else:
            # 1-2 points define no plane anywhere — np.cov of a single
            # point divides by N-1=0 (NaN → eigh fails to converge); any
            # unit vector is as good as another
            normals_v[bad] = np.array([0.0, 0.0, 1.0])

    # eigh eigenvectors are already unit — no renormalisation needed
    normals = normals_v[inv].astype(np.float32)
    if viewpoint is not None:
        to_vp = np.asarray(viewpoint, np.float32)[None] - pts.astype(np.float32)
        flip = np.einsum("ij,ij->i", normals, to_vp) < 0
        normals[flip] = -normals[flip]
    return normals


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
        from tpu3dlm.ops.geometry import scale_intrinsics

        fx, fy, cx, cy = scale_intrinsics(
            intr[0], intr[1], intr[2], intr[3], wh[0], d.shape[1]
        )
        return depth_to_points(
            d, fx, fy, cx, cy, pose=pose, scale_depth=scale_depth,
        )

    return jax.vmap(one)(depth, intrinsics.astype(jnp.float32),
                         rgb_size.astype(jnp.float32), poses.astype(jnp.float32))
