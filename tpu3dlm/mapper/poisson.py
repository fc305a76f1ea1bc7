"""Poisson surface reconstruction, TPU-native: FFT spectral Laplacian solve.

Capability parity with the reference's Open3D Poisson recipe
(src/mapper/mapping.py:121-137: KDTree normal estimation + screened Poisson
depth=11) — re-designed for the hardware instead of ported. Kazhdan's octree
multigrid is pointer-chasing the TPU cannot tile; on a dense grid the same
math is three dense steps XLA is built for:

1. **Normal splat** (host, O(N)): each point's oriented unit normal is
   trilinearly distributed into a regular grid → a smoothed vector field
   ``V ≈ ∇χ`` where χ is the solid-interior indicator function (∇χ points
   from free space into the solid, i.e. opposite the sensor-facing normal).
2. **Spectral solve** (device): solve ``∇²χ = ∇·V`` in one shot with real
   FFTs. Divergence and Laplacian both use the *central-difference symbol*
   ``D̂_a = i·sin(2πk_a/N_a)/h`` so the discretisation is self-consistent;
   modes where the symbol vanishes (DC and the per-axis Nyquist
   checkerboards) carry no surface information and are zeroed. A Gaussian
   low-pass ``exp(−σ²|k|²/2)`` stands in for Kazhdan's B-spline smoothing.
3. **Iso-extraction** (host): χ is sampled trilinearly at the input points;
   their mean is the iso value (the Kazhdan '06 rule), and the existing
   `marching_tetrahedra` triangulates — interior is the χ > iso side, so
   faces wind with outward normals toward the free space. Iso-crossings far
   from any input point (periodic wraparound leakage) are culled by a
   dilated occupancy-grid test.

The FFT grid rounds each axis up to the next 5-smooth length (radix-2/3/5
are the FFT sizes XLA lowers efficiently) and the same `max_voxels` ladder
as `density_field` bounds memory by coarsening the voxel.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def next_fast_len(n: int) -> int:
    """Smallest 5-smooth (2^a·3^b·5^c) integer ≥ n."""
    if n <= 2:
        return max(n, 1)
    best = 1 << (n - 1).bit_length()  # pow2 upper bound
    f5 = 1
    while f5 < best:
        f35 = f5
        while f35 < best:
            quot = -(-n // f35)  # ceil(n / f35)
            p2 = 1 << max(0, (quot - 1).bit_length())
            best = min(best, f35 * p2)
            f35 *= 3
        f5 *= 5
    return best


@functools.partial(jax.jit, static_argnames=("voxel", "sigma_voxels"))
def _solve_indicator(V, *, voxel: float, sigma_voxels: float):
    """∇²χ = ∇·V solved spectrally; V is (Nx, Ny, Nz, 3) f32. Device-side."""
    nx, ny, nz = V.shape[:3]
    h = jnp.float32(voxel)
    # central-difference derivative symbol per axis: i·sin(2πk/N)/h
    # (rfftn keeps the last axis half-spectrum)
    kx = jnp.fft.fftfreq(nx).astype(jnp.float32)  # cycles per sample
    ky = jnp.fft.fftfreq(ny).astype(jnp.float32)
    kz = jnp.fft.rfftfreq(nz).astype(jnp.float32)
    sx = jnp.sin(2 * jnp.pi * kx)[:, None, None] / h
    sy = jnp.sin(2 * jnp.pi * ky)[None, :, None] / h
    sz = jnp.sin(2 * jnp.pi * kz)[None, None, :] / h

    div = 1j * (
        sx * jnp.fft.rfftn(V[..., 0])
        + sy * jnp.fft.rfftn(V[..., 1])
        + sz * jnp.fft.rfftn(V[..., 2])
    )
    lam = -(sx * sx + sy * sy + sz * sz)  # div∘grad symbol (≤ 0)

    # Gaussian low-pass: continuum |k|² (no spurious zeros at Nyquist)
    w2 = (
        (2 * jnp.pi * kx[:, None, None] / h) ** 2
        + (2 * jnp.pi * ky[None, :, None] / h) ** 2
        + (2 * jnp.pi * kz[None, None, :] / h) ** 2
    )
    smooth = jnp.exp(-0.5 * (sigma_voxels * voxel) ** 2 * w2)

    safe = jnp.abs(lam) > 1e-12 / (h * h)
    chi_hat = jnp.where(safe, div * smooth / jnp.where(safe, lam, 1.0), 0.0)
    return jnp.fft.irfftn(chi_hat, s=(nx, ny, nz)).astype(jnp.float32)


def poisson_indicator(
    points: np.ndarray,
    normals: np.ndarray | None = None,
    voxel: float = 0.04,
    pad: int = 6,
    sigma_voxels: float = 1.5,
    max_voxels: int = 40_000_000,
    viewpoint: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, float, float]:
    """Cloud (+ optional oriented normals) → (χ field, origin, voxel, iso).

    ``normals`` should point *away from the solid* (toward the sensor);
    when None they are grid-PCA estimated (`ops/pointcloud`) and oriented
    toward ``viewpoint`` (default: the cloud centroid — the camera interior
    for room/vehicle scans). Interior is the χ > iso side.
    """
    pts = np.asarray(points, np.float32)
    if pts.shape[0] == 0:
        return np.zeros((2, 2, 2), np.float32), np.zeros(3, np.float32), voxel, 0.0
    if normals is None:
        from tpu3dlm.ops.pointcloud import estimate_normals_grid

        vp = (
            np.asarray(viewpoint, np.float32)
            if viewpoint is not None
            else pts.mean(axis=0)
        )
        normals = estimate_normals_grid(pts, voxel=max(2.0 * voxel, 0.08), viewpoint=vp)
    normals = np.asarray(normals, np.float32)

    from tpu3dlm.mapper.meshing import grid_bounds, trilinear_sample, trilinear_scatter

    # grid_bounds re-pads with the coarsened voxel — the pad (in voxels) is
    # load-bearing here: surface mass near the boundary would wrap through
    # the periodic FFT solve
    lo, dims_t, voxel = grid_bounds(
        pts, voxel, pad=pad, max_voxels=max_voxels,
        fast_len=next_fast_len, min_dim=4,
    )

    # ∇χ points from free space (χ≈0) into the solid: opposite the
    # sensor-facing normal (χ's absolute scale is arbitrary — the sampled
    # iso adapts to it)
    V = trilinear_scatter(pts, -normals, lo, dims_t, voxel)
    # the splatted field ships to the device in bf16 (half the host→device
    # bytes — the transfer, not the FFT, dominates the solve leg on a
    # tunnel-attached chip) and is widened to f32 on arrival: V feeds a
    # Gaussian-smoothed linear solve whose iso threshold adapts to χ's
    # scale, so bf16's 8-bit mantissa on the INPUT moves the extracted
    # surface by far less than a voxel (quality gates in test_meshing.py)
    Vd = jnp.asarray(V.astype(jnp.bfloat16)).astype(jnp.float32)
    chi = np.asarray(
        jax.device_get(_solve_indicator(Vd, voxel=voxel, sigma_voxels=sigma_voxels))
    )
    # Kazhdan '06 iso rule: mean of χ sampled at the input points. The mean
    # is estimated on ≤200k evenly-strided points — the estimator's noise
    # is O(σ_χ/√n), orders below the iso sensitivity, and the full-cloud
    # host sample was ~20% of the default-voxel reconstruction wall-clock.
    step = max(1, pts.shape[0] // 200_000)
    sub = pts[::step]
    iso = float(np.mean(trilinear_sample(chi, (sub - lo) / voxel)))
    return chi, lo.astype(np.float32), voxel, iso


def _cull_leakage(
    verts: np.ndarray,
    faces: np.ndarray,
    points: np.ndarray,
    origin: np.ndarray,
    cell: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Drop triangles whose centroid is > ~1 cell from any input point.

    The periodic spectral solve lets χ cross iso in big empty corners
    (wraparound leakage); real surface always lies on the cloud's support.
    One boolean occupancy grid + a 1-cell dilation, fully vectorised.
    """
    if len(faces) == 0:
        return verts, faces
    span_cells = np.maximum(
        2, np.ceil((points.max(axis=0) - origin) / cell).astype(np.int64) + 2
    )
    from tpu3dlm.native import native_cull_keep_mask

    keep = native_cull_keep_mask(verts, faces, points, origin, cell, span_cells)
    if keep is None:  # no native toolchain → vectorised numpy fallback
        occ = np.zeros(tuple(int(d) for d in span_cells), bool)
        pc = np.clip(
            np.floor((points - origin) / cell).astype(np.int64), 0, span_cells - 1
        )
        occ[pc[:, 0], pc[:, 1], pc[:, 2]] = True
        # 1-cell 26-neighbourhood dilation via shifted ORs
        dil = occ.copy()
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    if dx == dy == dz == 0:
                        continue
                    src = occ[
                        max(0, -dx) : occ.shape[0] - max(0, dx),
                        max(0, -dy) : occ.shape[1] - max(0, dy),
                        max(0, -dz) : occ.shape[2] - max(0, dz),
                    ]
                    dil[
                        max(0, dx) : occ.shape[0] - max(0, -dx),
                        max(0, dy) : occ.shape[1] - max(0, -dy),
                        max(0, dz) : occ.shape[2] - max(0, -dz),
                    ] |= src
        cent = verts[faces].mean(axis=1)
        cg = np.floor((cent - origin) / cell).astype(np.int64)
        inside = (cg >= 0).all(axis=1) & (cg < span_cells).all(axis=1)
        keep = np.zeros(len(faces), bool)
        keep[inside] = dil[cg[inside, 0], cg[inside, 1], cg[inside, 2]]
    faces = faces[keep]
    # O(V+F) compaction (a sort-based np.unique was ~half the cull leg)
    used_mask = np.zeros(len(verts), bool)
    used_mask[faces] = True
    remap = np.cumsum(used_mask, dtype=np.int64) - 1
    return verts[used_mask], remap[faces].astype(np.int32)


def mesh_poisson(
    points: np.ndarray,
    normals: np.ndarray | None = None,
    voxel: float = 0.04,
    viewpoint: np.ndarray | None = None,
    sigma_voxels: float = 1.5,
) -> tuple[np.ndarray, np.ndarray]:
    """Poisson-reconstruct a cloud → ((V,3) verts, (F,3) faces).

    Drop-in alternative to `meshing.mesh_point_cloud` (density shell):
    smoother, hole-filling, single-layer — the quality the reference gets
    from Open3D's Poisson (src/mapper/mapping.py:131-135), computed as a
    dense FFT solve on the device.
    """
    from tpu3dlm.mapper.meshing import marching_tetrahedra

    pts = np.asarray(points, np.float32)
    chi, origin, voxel, iso = poisson_indicator(
        pts, normals, voxel=voxel, viewpoint=viewpoint, sigma_voxels=sigma_voxels
    )
    if not np.isfinite(chi).all() or chi.max() <= chi.min():
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    # interior is χ > iso → outward face normals toward the χ < iso side
    verts, faces = marching_tetrahedra(
        chi, iso, origin, voxel, normals_toward_positive=False
    )
    # 2-voxel cells + 1-cell dilation ≈ Open3D's low-density vertex trim:
    # keeps the rim halo of open sheets within ~3 voxels of the samples
    return _cull_leakage(verts, faces, pts, origin, cell=2.0 * voxel)
