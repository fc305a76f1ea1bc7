"""Alignment animation: replay recorded transforms as an mp4.

Functional parity with the reference's ``src/map_alignment/visualise.py``
(VisualiseAlignment.create_video, :182-212): each recorded transformation is
interpolated in 20 log/exp steps (:82-130 — here the closed-form
`ops.geometry.se3_interpolate` replaces scipy logm/expm) and a frame is
rendered per step.

Rendering matches the reference's artifact quality without its Open3D
dependency: both clouds are surface-meshed (mapper/meshing.py — the
dependency-free stand-in for the reference's Poisson meshes, visualise.py:
26-38) and drawn with the Lambert-shaded software renderer
(utils/render.py) under a slow camera orbit; if meshing yields nothing
(degenerate cloud) the renderer falls back to the orthographic point splat.
"""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np

from tpu3dlm.ops.geometry import se3_interpolate

_BASE_COLOR = (0.55, 0.55, 0.58)  # gold-standard map: grey
_COMP_COLOR = (0.85, 0.25, 0.22)  # comparison map: red


def _splat(
    points: np.ndarray,
    colors: np.ndarray,
    canvas: np.ndarray,
    bounds: tuple[np.ndarray, np.ndarray],
):
    """Orthographic xy→image point splat onto an existing canvas (in place)."""
    lo, hi = bounds
    h, w = canvas.shape[:2]
    span = np.maximum(hi - lo, 1e-6)
    u = ((points[:, 0] - lo[0]) / span[0] * (w - 1)).astype(np.int32)
    v = ((points[:, 1] - lo[1]) / span[1] * (h - 1)).astype(np.int32)
    ok = (u >= 0) & (u < w) & (v >= 0) & (v < h)
    canvas[v[ok], u[ok]] = colors if colors.ndim == 1 else colors[ok]


class VisualiseAlignment:
    """Renders the stepwise alignment of the comparison map onto the base map."""

    def __init__(
        self,
        base_points: np.ndarray,
        comparison_points: np.ndarray,
        image_hw: tuple[int, int] = (480, 640),
        max_points: int = 50_000,
        renderer: str = "auto",  # "mesh" | "splat" | "auto"
        mesh_voxel: float | None = None,
        mesher: str = "density",  # "density" shell | "poisson" (mapper/poisson.py)
        orbit_sweep: float = 0.9,  # total camera azimuth sweep (radians)
    ):
        rng = np.random.default_rng(0)

        def sub(p):
            p = np.asarray(p, np.float32)
            if p.shape[0] > max_points:
                p = p[rng.choice(p.shape[0], max_points, replace=False)]
            return p

        self.base = sub(base_points)
        self.comparison = sub(comparison_points)
        self.image_hw = image_hw
        self.orbit_sweep = orbit_sweep
        self.frames: list[np.ndarray] = []
        self.logger = logging.getLogger(__name__)

        allpts = np.concatenate([self.base, self.comparison])
        margin = 0.1 * (allpts.max(0) - allpts.min(0) + 1e-6)
        self.bounds = (allpts.min(0) - margin, allpts.max(0) + margin)
        self.center = allpts.mean(0)
        self.radius = 1.6 * float(np.linalg.norm(allpts - self.center, axis=1).max())

        self.base_mesh = self.comp_mesh = None
        if mesher not in ("density", "poisson"):
            raise ValueError(
                f"unknown mesher {mesher!r} (cfg `mesher`): use 'density' or 'poisson'"
            )
        if renderer in ("mesh", "auto"):
            if mesher == "poisson":
                from tpu3dlm.mapper.poisson import mesh_poisson as _mesh
            else:
                from tpu3dlm.mapper.meshing import mesh_point_cloud as _mesh

            span = float((allpts.max(0) - allpts.min(0)).max())
            voxel = mesh_voxel or max(span / 72.0, 1e-3)
            bm = _mesh(self.base, voxel=voxel)
            cm = _mesh(self.comparison, voxel=voxel)
            if len(bm[1]) and len(cm[1]):
                self.base_mesh, self.comp_mesh = bm, cm
                self.logger.info(
                    "meshed maps for animation: base %d tris, comparison %d tris",
                    len(bm[1]), len(cm[1]),
                )
            elif renderer == "mesh":
                raise ValueError("meshing produced no triangles; use renderer='splat'")

    @property
    def uses_mesh(self) -> bool:
        return self.base_mesh is not None

    def _render(
        self, comparison_pts: np.ndarray, comp_verts: np.ndarray | None, azimuth: float
    ) -> np.ndarray:
        h, w = self.image_hw
        if self.uses_mesh and comp_verts is not None:
            from tpu3dlm.utils.render import look_at, orbit_eye, render_scene

            view = look_at(orbit_eye(self.center, self.radius, azimuth), self.center)
            return render_scene(
                [
                    (self.base_mesh[0], self.base_mesh[1], _BASE_COLOR),
                    (comp_verts, self.comp_mesh[1], _COMP_COLOR),
                ],
                view,
                (h, w),
            )
        canvas = np.full((h, w, 3), 255, np.uint8)
        _splat(self.base, np.array([90, 90, 90], np.uint8), canvas, self.bounds)
        _splat(comparison_pts, np.array([220, 60, 60], np.uint8), canvas, self.bounds)
        return canvas

    @staticmethod
    def _as_matrix(transformation) -> np.ndarray:
        """4×4 rigid transform from a matrix or the reference's (R, center)
        rotation tuple (visualise.py:89-96)."""
        if isinstance(transformation, tuple):
            from tpu3dlm.ops.icp import rotation_about

            R, center = transformation
            return np.asarray(
                rotation_about(
                    jnp.asarray(R, jnp.float32), jnp.asarray(center, jnp.float32)
                )
            )
        return np.asarray(transformation, np.float32)

    def _apply_incremental_transformation(
        self, transformation, comparison, comp_verts=None, steps=20, azimuths=None
    ):
        """One recorded transform → `steps` interpolated frames."""
        T = self._as_matrix(transformation)
        T_inc = np.asarray(se3_interpolate(jnp.asarray(T), jnp.float32(1.0 / steps)))
        for s in range(steps):
            comparison = comparison @ T_inc[:3, :3].T + T_inc[:3, 3]
            if comp_verts is not None:
                comp_verts = comp_verts @ T_inc[:3, :3].T + T_inc[:3, 3]
            az = azimuths[s] if azimuths is not None else 0.0
            self.frames.append(self._render(comparison, comp_verts, az))
        return comparison, comp_verts

    def create_video(
        self,
        transformations: list,
        output_video: str = "alignment_animation.mp4",
        fps: int = 30,
        steps: int = 20,
    ) -> int:
        """Replay all transforms; write mp4 (falls back to .npz of frames when
        no ffmpeg encoder is available). Returns the frame count."""
        if not transformations:
            # nothing recorded (e.g. a resume that skipped alignment):
            # an empty writer/np.stack would raise far from the cause
            self.logger.warning("no transformations to animate; skipping video")
            return 0
        comparison = self.comparison
        comp_verts = self.comp_mesh[0].copy() if self.uses_mesh else None
        # drop near-identity steps: ICP's convergence early-stop pads the
        # record with identity increments (ops/icp.py) — replaying them
        # would freeze the tail of the animation. Keep at least one step.
        def _magnitude(t) -> float:
            if isinstance(t, tuple):
                R = np.asarray(t[0])
                return abs(float(np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1))))
            T = np.asarray(t)
            cos = np.clip((np.trace(T[:3, :3]) - 1) / 2, -1, 1)
            return float(np.linalg.norm(T[:3, 3]) + np.arccos(cos))

        moving = [t for t in transformations if _magnitude(t) > 1e-6]
        transformations = moving or list(transformations[:1])

        total = max(len(transformations) * steps, 1)
        az_all = np.linspace(-self.orbit_sweep / 2, self.orbit_sweep / 2, total)
        for i, t in enumerate(transformations):
            self.logger.info("transform %d/%d", i + 1, len(transformations))
            comparison, comp_verts = self._apply_incremental_transformation(
                t, comparison, comp_verts, steps,
                azimuths=az_all[i * steps : (i + 1) * steps],
            )

        try:
            import imageio

            with imageio.get_writer(output_video, fps=fps, format="mp4") as w:
                for frame in self.frames:
                    w.append_data(frame)
            self.logger.info("Video written to %s", output_video)
        except Exception as e:  # encoder missing → still persist the frames
            fallback = output_video + ".npz"
            np.savez_compressed(fallback, frames=np.stack(self.frames))
            self.logger.warning("mp4 encode failed (%s); frames saved to %s", e, fallback)
        return len(self.frames)


if __name__ == "__main__":  # standalone harness (reference visualise.py:215-243)
    import argparse
    import os
    import pickle

    from tpu3dlm.data.ply import load_ply
    from tpu3dlm.utils.config import ConfigLoader

    parser = argparse.ArgumentParser(description="Processing Configuration")
    parser.add_argument("--data", type=str, default="ideal_scan")
    parser.add_argument("--config", type=str, default=os.path.join("configs", "variables.cfg"))
    args = parser.parse_args()
    if args.data == "gold_std":
        raise ValueError("The parameter 'gold_std' is not allowed for --data.")
    cfg = ConfigLoader(args.config, args.data)
    cfg_gold = ConfigLoader(args.config, "gold_std")

    with open(cfg.pickle_path, "rb") as f:
        variables = pickle.load(f)
    base_pts, _ = load_ply(cfg_gold.ply_path)
    comp_pts, _ = load_ply(cfg.ply_path)
    out = os.path.join(os.path.dirname(cfg.csv_output) or ".", "alignment_visualisation.mp4")
    vis = VisualiseAlignment(base_pts, comp_pts)
    n = vis.create_video(variables["transformations"], out)
    print(f"{n} frames → {out}")
