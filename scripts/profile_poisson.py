"""Per-leg timing of the Poisson reconstruction (VERDICT r2 item 7).

Rebuilds the PERF.md scenario: ~1M-pt box-interior cloud (8 x 3 x 2.4 m
walls, 4 mm noise), default voxel 0.04. Prints one JSON line with the
normals / splat / solve / march / cull legs and end-to-end seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def box_interior_cloud(n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    L, W, H = 8.0, 3.0, 2.4
    areas = np.array([L * W, L * W, L * H, L * H, W * H, W * H])
    counts = (areas / areas.sum() * n).astype(int)
    pts = []
    for face, c in enumerate(counts):
        u, v = rng.uniform(size=(2, c))
        if face < 2:  # floor/ceiling
            p = np.stack([u * L, v * W, np.full(c, 0.0 if face == 0 else H)], 1)
        elif face < 4:  # long walls
            p = np.stack([u * L, np.full(c, 0.0 if face == 2 else W), v * H], 1)
        else:  # end walls
            p = np.stack([np.full(c, 0.0 if face == 4 else L), u * W, v * H], 1)
        pts.append(p)
    cloud = np.concatenate(pts).astype(np.float32)
    return cloud + rng.normal(0, 0.004, cloud.shape).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--voxel", type=float, default=0.04)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from tpu3dlm.utils.backend import enable_compile_cache

    enable_compile_cache()
    from tpu3dlm.mapper.meshing import marching_tetrahedra
    from tpu3dlm.mapper.poisson import _cull_leakage, poisson_indicator

    pts = box_interior_cloud(args.points)
    t = {}

    from tpu3dlm.mapper.meshing import grid_bounds, trilinear_scatter
    from tpu3dlm.mapper.poisson import next_fast_len
    from tpu3dlm.ops.pointcloud import estimate_normals_grid

    t0 = time.perf_counter()
    normals = estimate_normals_grid(
        pts, voxel=max(2.0 * args.voxel, 0.08), viewpoint=pts.mean(axis=0)
    )
    t["normals"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    lo, dims_t, voxel = grid_bounds(
        pts, args.voxel, pad=6, max_voxels=40_000_000,
        fast_len=next_fast_len, min_dim=4,
    )
    V = trilinear_scatter(pts, -normals, lo, dims_t, voxel)
    t["splat"] = time.perf_counter() - t0
    # warm-up: the spectral solve compiles once per grid shape (persistent
    # cache); serving reconstructs many captures per process, so the warm
    # number is the honest per-reconstruction cost — the cold compile is
    # reported separately
    t0 = time.perf_counter()
    poisson_indicator(pts, normals, voxel=args.voxel)
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    chi, origin, voxel, iso = poisson_indicator(
        pts, normals, voxel=args.voxel
    )
    t["solve_total"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    verts, faces = marching_tetrahedra(
        chi, iso, origin, voxel, normals_toward_positive=False
    )
    t["march"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    verts, faces = _cull_leakage(verts, faces, pts, origin, cell=2.0 * voxel)
    t["cull"] = time.perf_counter() - t0

    # the standalone splat probe is diagnostic only — poisson_indicator
    # re-runs it inside solve_total, so exclude it from the e2e sum
    e2e = sum(v for k, v in t.items() if k != "splat")
    print(json.dumps({
        "metric": "poisson_default_voxel_seconds",
        "value": round(e2e, 3),
        "unit": "s",
        "first_solve_incl_compile_s": round(t_cold, 3),
        "legs": {k: round(v, 3) for k, v in t.items()},
        "grid": list(chi.shape),
        "faces": int(len(faces)),
        "verts": int(len(verts)),
    }))


if __name__ == "__main__":
    main()
