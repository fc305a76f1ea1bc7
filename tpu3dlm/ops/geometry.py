"""L0 geometry core: quaternions, SE(3), pinhole unprojection, bbox utilities.

TPU-native replacement for the reference's (snapshot-missing)
``src/utils/transformations.py::Transforms`` — the contract is pinned by its
call sites (reference ``src/mapper/pose_processor.py:140,174-206,254`` and
``src/mapper/mapping.py:163-165,187``).  Everything here is a pure function
over fixed-shape ``jnp`` arrays, safe under ``jit`` / ``vmap`` / ``shard_map``.

Conventions
-----------
* Pose row: ``[tx, ty, tz, qx, qy, qz, qw]`` (RTAB-Map ``poses.txt`` order
  after dropping timestamp/id — reference ``src/mapper/database_query.py:22``).
* ``pose_to_matrix`` is camera→world; extrinsics (world→camera) is its
  inverse (reference ``src/mapper/pose_processor.py:140-141``).
* 2D bbox: ``[x1, y1, x2, y2]`` in pixels.
* Depth images are float32 metres×`scale` (the ingest layer stores mm, i.e.
  metres×1000, matching reference ``src/detector/dataset.py:77``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# On TPU an f32 matmul/einsum defaults to ONE bf16 MXU pass (~3 decimal
# digits): at scan scale (metres, coordinates up to ~10) that is
# centimetre-level noise on every transformed point — measured 0.03 m per
# pose transform and 45% wrong nearest-neighbour picks at 4k-point targets
# on v5e (tests/test_precision.py pins both). Every matmul whose operands
# are COORDINATES or DEPTHS must therefore pass ``precision=PRECISE``
# (multi-pass, f32-exact). Model matmuls (YOLO/BEiT) stay single-pass by
# their explicit bfloat16 dtype choice; image-INTENSITY matmuls (the
# ops/image.py crop-resample weights) deliberately stay at default
# precision — their values live in [0, 1] where one bf16 pass is ~1-2 u8
# LSBs, and they are on the fused hot path.
PRECISE = jax.lax.Precision.HIGHEST

# ---------------------------------------------------------------------------
# Quaternions / SE(3)
# ---------------------------------------------------------------------------


def quat_to_rotmat(q: Array) -> Array:
    """(qx, qy, qz, qw) → 3×3 rotation matrix. Normalises the quaternion."""
    q = q / jnp.linalg.norm(q)
    x, y, z, w = q[0], q[1], q[2], q[3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)]),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)]),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)]),
        ]
    )


def rotmat_to_quat(R: Array) -> Array:
    """3×3 rotation matrix → (qx, qy, qz, qw), branch-free for jit.

    Uses the numerically-stable four-branch construction, selecting the
    branch with the largest pivot via ``jnp.where`` (all four are computed;
    shapes stay static).
    """
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-12))

    # branch w
    sw = safe_sqrt(tr + 1.0) * 2.0
    qw_w = jnp.stack([(m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw, 0.25 * sw])
    # branch x
    sx = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    qx_b = jnp.stack([0.25 * sx, (m01 + m10) / sx, (m02 + m20) / sx, (m21 - m12) / sx])
    # branch y
    sy = safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    qy_b = jnp.stack([(m01 + m10) / sy, 0.25 * sy, (m12 + m21) / sy, (m02 - m20) / sy])
    # branch z
    sz = safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    qz_b = jnp.stack([(m02 + m20) / sz, (m12 + m21) / sz, 0.25 * sz, (m10 - m01) / sz])

    use_w = tr > 0.0
    use_x = (~use_w) & (m00 >= m11) & (m00 >= m22)
    use_y = (~use_w) & (~use_x) & (m11 >= m22)
    q = jnp.where(use_w, qw_w, jnp.where(use_x, qx_b, jnp.where(use_y, qy_b, qz_b)))
    return q / jnp.linalg.norm(q)


def pose_to_matrix(pose: Array) -> Array:
    """[tx,ty,tz,qx,qy,qz,qw] → 4×4 camera→world SE(3) matrix."""
    t = pose[:3]
    R = quat_to_rotmat(pose[3:7])
    T = jnp.eye(4, dtype=pose.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    return T


def invert_se3(T: Array) -> Array:
    """Closed-form inverse of an SE(3) matrix (no general solve)."""
    R = T[:3, :3]
    t = T[:3, 3]
    Ti = jnp.eye(4, dtype=T.dtype)
    Ti = Ti.at[:3, :3].set(R.T)
    Ti = Ti.at[:3, 3].set(-jnp.matmul(R.T, t, precision=PRECISE))
    return Ti


def transform_points(T: Array, pts: Array) -> Array:
    """Apply 4×4 transform to (..., 3) points."""
    return jnp.matmul(pts, T[:3, :3].T, precision=PRECISE) + T[:3, 3]


def camera_direction(pose: Array, forward: Array | None = None) -> Array:
    """Unit view direction of a camera pose (rotated +Z axis).

    Parity target: ``Transforms.get_camera_direction`` consumed at reference
    ``src/mapper/mapping.py:187`` and ``src/mapper/database_query.py:37``.
    """
    if forward is None:
        forward = jnp.array([0.0, 0.0, 1.0], dtype=pose.dtype)
    return jnp.matmul(quat_to_rotmat(pose[3:7]), forward, precision=PRECISE)


# ---------------------------------------------------------------------------
# SO(3)/SE(3) log & exp — closed-form (replaces scipy logm/expm used at
# reference src/map_alignment/visualise.py:117-130 for transform interpolation)
# ---------------------------------------------------------------------------


def _skew(k: Array) -> Array:
    """Cross-product matrix [k]× of a 3-vector."""
    return jnp.array(
        [
            [0.0, -k[2], k[1]],
            [k[2], 0.0, -k[0]],
            [-k[1], k[0], 0.0],
        ],
        dtype=k.dtype,
    )


def so3_log(R: Array) -> Array:
    """Rotation matrix → axis-angle vector (omega, |omega| = angle).

    Covers the FULL angle range including θ → π, where the standard
    skew-part formula degenerates: w = (R - Rᵀ)∨ → 0 for a 180° rotation
    while the rotation certainly isn't identity (the old single-branch
    version returned [0,0,0] there, which silently dropped the rotation
    in se3_interpolate replays of turned-around scans). Near π the axis
    is recovered from (R + Rᵀ)/2 − cosθ·I = (1−cosθ)·uuᵀ — EXACTLY
    proportional to uuᵀ, no skew contamination — with the sign taken
    from the (small but directional) skew part. Exactly at π both ±axis
    are valid logarithms; the sign rule picks one deterministically.
    """
    cos_theta = jnp.clip((jnp.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    w = jnp.stack([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    # generic branch (sin θ well away from 0); first-order for tiny θ
    scale = jnp.where(
        theta < 1e-6, 0.5, theta / (2.0 * jnp.sin(jnp.maximum(theta, 1e-12)))
    )
    generic = w * scale
    # near-π branch: N = (1−cosθ)·uuᵀ, dominant column ∝ u
    N = 0.5 * (R + R.T) - cos_theta * jnp.eye(3, dtype=R.dtype)
    col = jnp.take(N, jnp.argmax(jnp.linalg.norm(N, axis=0)), axis=1)
    axis = col / jnp.maximum(jnp.linalg.norm(col), 1e-12)
    axis = axis * jnp.where(jnp.dot(axis, w) < 0.0, -1.0, 1.0)
    return jnp.where(theta > 3.0, axis * theta, generic)


def so3_exp(omega: Array) -> Array:
    """Axis-angle vector → rotation matrix (Rodrigues)."""
    theta = jnp.linalg.norm(omega)
    safe = jnp.maximum(theta, 1e-12)
    K = _skew(omega / safe)
    R = jnp.eye(3, dtype=omega.dtype) + jnp.sin(theta) * K + (1 - jnp.cos(theta)) * jnp.matmul(K, K, precision=PRECISE)
    return jnp.where(theta < 1e-8, jnp.eye(3, dtype=omega.dtype), R)


def se3_interpolate(T: Array, alpha: Array) -> Array:
    """Fractional power T^alpha of an SE(3) transform (geodesic interpolation).

    Closed-form replacement for ``expm(logm(T) * alpha)``
    (reference src/map_alignment/visualise.py:128-130).
    """
    R = T[:3, :3]
    t = T[:3, 3]
    omega = so3_log(R)

    def V_of(om):
        # V matrix of the SE(3) log: t = V @ rho. Series fallback keeps
        # small-angle cases stable.
        th = jnp.linalg.norm(om)
        safe = jnp.maximum(th, 1e-12)
        K = _skew(om / safe)
        small = th < 1e-6
        A = jnp.where(small, 0.5, (1 - jnp.cos(th)) / safe**2)  # (1-cos)/th²
        B = jnp.where(small, 1.0 / 6.0, (th - jnp.sin(th)) / safe**3)
        return jnp.eye(3, dtype=T.dtype) + A * (K * safe) + B * (jnp.matmul(K, K, precision=PRECISE) * safe**2)

    rho = jnp.linalg.solve(V_of(omega), t)  # rho = V⁻¹ t; interpolate rho·α
    om_a = omega * alpha
    R_a = so3_exp(om_a)
    t_a = jnp.matmul(V_of(om_a), rho * alpha, precision=PRECISE)

    out = jnp.eye(4, dtype=T.dtype)
    out = out.at[:3, :3].set(R_a)
    out = out.at[:3, 3].set(t_a)
    return out


# ---------------------------------------------------------------------------
# Bounding-box utilities
# ---------------------------------------------------------------------------


def scale_bbox(bbox: Array, from_wh: Array, to_wh: Array) -> Array:
    """Rescale [x1,y1,x2,y2] from one image resolution to another.

    Parity target: ``Transforms.scale_bounding_box`` (reference
    src/mapper/pose_processor.py:174-178 — RGB resolution → depth resolution).
    """
    sx = to_wh[0] / from_wh[0]
    sy = to_wh[1] / from_wh[1]
    return bbox * jnp.stack([sx, sy, sx, sy])


def bbox_corners_2d(bbox: Array) -> Array:
    """[x1,y1,x2,y2] → 4 corner pixels (TL, BL, BR, TR), shape (4, 2).

    Corner order mirrors the homography source-point order the reference uses
    (src/detector/detector.py:202) so downstream quad handling is consistent.
    """
    x1, y1, x2, y2 = bbox[0], bbox[1], bbox[2], bbox[3]
    return jnp.stack(
        [
            jnp.stack([x1, y1]),
            jnp.stack([x1, y2]),
            jnp.stack([x2, y2]),
            jnp.stack([x2, y1]),
        ]
    )


def scale_intrinsics(fx, fy, cx, cy, rgb_width, depth_width):
    """Scale RGB-resolution intrinsics to depth resolution (reference
    src/mapper/pose_processor.py:133-137)."""
    s = rgb_width / depth_width
    return fx / s, fy / s, cx / s, cy / s


# ---------------------------------------------------------------------------
# Masked median depth
# ---------------------------------------------------------------------------


def masked_median(values: Array, mask: Array) -> tuple[Array, Array]:
    """Median of ``values`` where ``mask`` is True, with numpy semantics
    (average of the two middle elements for even counts).

    Returns (median, valid) where valid is False when the mask is empty.
    Static shapes: invalid entries are sorted to +inf and selection is done
    by count, so this is jit/vmap-safe.
    """
    flat_v = values.reshape(-1)
    flat_m = mask.reshape(-1)
    n = jnp.sum(flat_m.astype(jnp.int32))
    s = jnp.sort(jnp.where(flat_m, flat_v, jnp.inf))
    lo = jnp.maximum((n - 1) // 2, 0)
    hi = jnp.maximum(n // 2, 0)
    med = (s[lo] + s[hi]) * 0.5
    valid = n > 0
    return jnp.where(valid, med, 0.0), valid


def bbox_region_mask(bbox: Array, height: int, width: int) -> Array:
    """Boolean (height, width) mask of pixels inside [x1,y1,x2,y2] (inclusive)."""
    ys = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    x1 = jnp.floor(jnp.minimum(bbox[0], bbox[2]))
    x2 = jnp.ceil(jnp.maximum(bbox[0], bbox[2]))
    y1 = jnp.floor(jnp.minimum(bbox[1], bbox[3]))
    y2 = jnp.ceil(jnp.maximum(bbox[1], bbox[3]))
    return (xs >= x1) & (xs <= x2) & (ys >= y1) & (ys <= y2)


def bbox_median_depth(depth: Array, bbox: Array, min_depth: float = 1e-6) -> tuple[Array, Array]:
    """Exact median of valid (> min_depth) depth values inside a bbox.

    This is the designed semantic of the reference's ``_depth_to_3d``
    "z-values from median over bbox (x, y) range"
    (src/mapper/pose_processor.py:182-196): all four corners of a detection
    share one robust z, the median depth over the box region — right for the
    planar signage the pipeline maps, and robust to depth holes.

    Cost: one full-image sort per box — use `bbox_sampled_median_depth` on
    the hot path (the projection kernel), which is ~50× cheaper and exact on
    piecewise-constant regions.
    """
    h, w = depth.shape
    mask = bbox_region_mask(bbox, h, w) & (depth > min_depth)
    return masked_median(depth, mask)


def bbox_sampled_median_depth(
    depth: Array,
    bbox: Array,
    samples: int = 32,
    min_depth: float = 1e-6,
) -> tuple[Array, Array]:
    """Median depth over a fixed samples×samples grid inside the bbox.

    The grid is cell-centred, so every grid point lies strictly within the
    box; small boxes get (coverage-weighted) duplicate pixels, large boxes a
    regular subsample — the median of the grid equals the exact box median
    whenever depth is piecewise-constant over the box (the planar-sign case)
    and is a consistent estimator otherwise. Sorts samples² values instead
    of the whole depth image.
    """
    h, w = depth.shape
    x1 = jnp.minimum(bbox[0], bbox[2])
    x2 = jnp.maximum(bbox[0], bbox[2])
    y1 = jnp.minimum(bbox[1], bbox[3])
    y2 = jnp.maximum(bbox[1], bbox[3])
    frac = (jnp.arange(samples, dtype=jnp.float32) + 0.5) / samples
    xs = jnp.clip(jnp.round(x1 + frac * (x2 - x1)), 0.0, w - 1.0)
    ys = jnp.clip(jnp.round(y1 + frac * (y2 - y1)), 0.0, h - 1.0)
    # one-hot selection matmuls (MXU) instead of a 2-D gather: the gather was
    # 110 of project_boxes' 117 ms at bench shapes (F=128, B=64) — scattered
    # loads serialise on the VPU, while Sy·depth·Sxᵀ rides the MXU. Each
    # Sy/Sx row has exactly one 1 (rounded coords are exact small integers in
    # f32), so the product equals the gathered grid bit-for-bit — PROVIDED
    # the matmul runs at full f32 precision: the TPU default single-pass
    # bf16 matmul would round mm-scale depth values to ~8-16 mm granularity
    # (HIGHEST = 3-pass bf16 decomposition, exact for f32 inputs, and still
    # ~10× faster than the gather it replaces).
    row_ids = jax.lax.broadcasted_iota(jnp.float32, (samples, h), 1)
    col_ids = jax.lax.broadcasted_iota(jnp.float32, (samples, w), 1)
    Sy = (row_ids == ys[:, None]).astype(depth.dtype)
    Sx = (col_ids == xs[:, None]).astype(depth.dtype)
    hp = jax.lax.Precision.HIGHEST
    vals = jnp.matmul(jnp.matmul(Sy, depth, precision=hp), Sx.T, precision=hp)
    return masked_median(vals, vals > min_depth)


# ---------------------------------------------------------------------------
# Pinhole unprojection
# ---------------------------------------------------------------------------


def unproject(px: Array, py: Array, z: Array, fx, fy, cx, cy) -> Array:
    """Pixel (px, py) at depth z → camera-frame (X, Y, Z)."""
    X = (px - cx) * z / fx
    Y = (py - cy) * z / fy
    return jnp.stack([X, Y, jnp.broadcast_to(z, jnp.shape(X))], axis=-1)


def create_3d_bounding_box(corners4: Array, depth_buffer: Array | float) -> Array:
    """Extrude a planar 4-corner quad into an 8-corner 3D box along its normal.

    Parity target: ``Transforms.create_3d_bounding_box`` (reference
    src/mapper/pose_processor.py:204-206, src/mapper/mapping.py:163-165) —
    used with a small depth buffer to give detected signs physical thickness.

    Returns (8, 3): corners4 - n*buffer then corners4 + n*buffer.
    """
    v1 = corners4[1] - corners4[0]
    v2 = corners4[3] - corners4[0]
    n = jnp.cross(v1, v2)
    n = n / jnp.maximum(jnp.linalg.norm(n), 1e-12)
    front = corners4 - n * depth_buffer
    back = corners4 + n * depth_buffer
    return jnp.concatenate([front, back], axis=0)
