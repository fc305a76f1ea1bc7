"""3D map assembly: cloud preprocessing + (optional) rendering.

Parity target: ``Mapping`` (reference src/mapper/mapping.py) —
``make_point_cloud`` / ``make_mesh`` with DBSCAN preprocessing keeping the
largest cluster, box overlays (red = raw, green = optimised ×1.5 buffer) and
optional pose overlay. Analysis stays dependency-free (our grid DBSCAN, PLY
I/O); interactive rendering and Poisson meshing are presentation-layer and
gated on Open3D's availability (absent in the TPU image — SURVEY.md §2c
keeps them host-side extras, not framework requirements).
"""

from __future__ import annotations

import logging

import numpy as np

from tpu3dlm.data.ply import load_ply, save_ply
from tpu3dlm.mapper.clustering import largest_cluster
from tpu3dlm.mapper.projection import GlobalBoxes
from tpu3dlm.ops import geometry as G

try:  # optional presentation dependency
    import open3d as _o3d  # noqa: N811
except Exception:  # pragma: no cover - absent in the TPU image
    _o3d = None


def _boxes_iter(bboxes):
    """Yield (4,3) corner quads from GlobalBoxes or frame-dict records."""
    if isinstance(bboxes, GlobalBoxes):
        bboxes = bboxes.to_frame_dict()
    for _, rows in sorted(bboxes.items()):
        for row in rows:
            yield np.stack([np.asarray(c, np.float32) for c in row[:4]])


class Mapping:
    def __init__(
        self,
        global_bboxes_data,
        optimised_bboxes,
        pose,
        eps: float = 0.04,
        min_points: int = 1000,
        ply_filepath: str = "cloud.ply",
        preprocess_point_cloud: bool = True,
        overlay_pose: bool = False,
        bbox_depth_buffer: float = 0.02,
        view_unprocessed_bboxes: bool = False,
    ):
        self.global_bboxes_data = global_bboxes_data
        self.optimised_bboxes = optimised_bboxes
        self.pose = pose
        self.eps = eps
        self.min_points = min_points
        self.ply_filepath = ply_filepath
        self.preprocess_point_cloud = preprocess_point_cloud
        self.overlay_pose = overlay_pose
        self.bbox_depth_buffer = bbox_depth_buffer
        self.view_unprocessed_bboxes = view_unprocessed_bboxes
        self.logger = logging.getLogger(__name__)

        self.points, self.colors = load_ply(ply_filepath)

    # -- analysis ---------------------------------------------------------

    def preprocess(self) -> np.ndarray:
        """DBSCAN → keep the largest cluster (reference mapping.py:99-119)."""
        idx = largest_cluster(self.points, self.eps, self.min_points)
        self.logger.info(
            "DBSCAN kept %d/%d points (largest cluster)", len(idx), len(self.points)
        )
        self.points = self.points[idx]
        if self.colors is not None:
            self.colors = self.colors[idx]
        return idx

    def make_point_cloud(self, output_path: str | None = None):
        if self.preprocess_point_cloud:
            self.preprocess()
        if output_path:
            save_ply(output_path, self.points, self.colors)
        if _o3d is not None:
            self._visualiser(self._to_o3d())
        return self.points

    def make_mesh(
        self,
        output_path: str | None = None,
        voxel: float = 0.04,
        mesher: str = "density",
    ) -> tuple[np.ndarray, np.ndarray]:
        """Surface-reconstruct the (preprocessed) cloud → triangle mesh.

        Dependency-free, two reconstructors replacing the reference's
        Open3D Poisson recipe (mapping.py:121-137):
        ``mesher="density"`` — density splat + marching tetrahedra
        (mapper/meshing.py), a tight double-sided shell; ``"poisson"`` —
        FFT spectral Poisson solve on the device (mapper/poisson.py), the
        smooth single-layer surface the reference's recipe produces,
        normals oriented toward the camera trajectory. When Open3D IS
        present the interactive visualiser still shows its Poisson mesh
        for presentation parity. Returns ((V, 3) vertices, (F, 3) faces).
        """
        from tpu3dlm.data.ply import save_ply_mesh
        from tpu3dlm.mapper.meshing import mesh_point_cloud

        if mesher not in ("density", "poisson"):
            raise ValueError(
                f"unknown mesher {mesher!r} (cfg `mesher`): use 'density' or 'poisson'"
            )
        if self.preprocess_point_cloud:
            self.preprocess()
        if mesher == "poisson":
            from tpu3dlm.mapper.poisson import mesh_poisson

            viewpoint = None
            try:  # camera-trajectory centroid orients the normals
                viewpoint = np.asarray(
                    self.pose[["tx", "ty", "tz"]], np.float32
                ).mean(axis=0)
            except (KeyError, TypeError, IndexError):
                self.logger.warning(
                    "pose has no tx/ty/tz columns; orienting Poisson normals "
                    "toward the cloud centroid instead of the camera trajectory"
                )
            verts, faces = mesh_poisson(self.points, voxel=voxel, viewpoint=viewpoint)
        else:
            verts, faces = mesh_point_cloud(self.points, voxel=voxel)
        self.logger.info(
            "meshed %d points → %d vertices / %d triangles",
            len(self.points), len(verts), len(faces),
        )
        if output_path:
            save_ply_mesh(output_path, verts, faces)
        if _o3d is not None:  # presentation extra: Poisson + interactive view
            self._visualiser(self._poisson_mesh())
        return verts, faces

    def box_line_sets(self, bboxes=None, buffer_scale: float = 1.5) -> list[np.ndarray]:
        """Overlay boxes as (8, 3) corner arrays (optimised set by default)."""
        import jax.numpy as jnp

        out = []
        for quad in _boxes_iter(bboxes if bboxes is not None else self.optimised_bboxes):
            out.append(
                np.asarray(
                    G.create_3d_bounding_box(
                        jnp.asarray(quad), self.bbox_depth_buffer * buffer_scale
                    )
                )
            )
        return out

    def overlay_geometry(self) -> dict:
        """Every overlay the reference visualiser draws, as dependency-free
        geometry (reference mapping.py:139-197):

        * ``optimised_boxes``: green (8, 3) boxes, buffer ×1.5;
        * ``raw_boxes``: red unoptimised boxes — only when
          ``view_unprocessed_bboxes`` (mapping.py:152-167);
        * ``pose_points`` (F, 3) + ``pose_direction_lines`` (F, 2, 3)
          camera-direction segments — only when ``overlay_pose``
          (mapping.py:181-192).
        The Open3D-gated viewer consumes exactly this dict, so the geometry
        is unit-testable without a display.
        """
        import jax
        import jax.numpy as jnp

        geo: dict = {
            "optimised_boxes": self.box_line_sets(),
            "raw_boxes": [],
            "pose_points": None,
            "pose_direction_lines": None,
        }
        if self.view_unprocessed_bboxes:
            geo["raw_boxes"] = self.box_line_sets(
                self.global_bboxes_data, buffer_scale=1.0
            )
        if self.overlay_pose and self.pose is not None:
            if hasattr(self.pose, "columns"):
                pose_arr = self.pose[
                    ["tx", "ty", "tz", "qx", "qy", "qz", "qw"]
                ].to_numpy(dtype=np.float32)
            else:
                pose_arr = np.asarray(self.pose, np.float32)
            pts = pose_arr[:, :3]
            dirs = np.asarray(
                jax.vmap(G.camera_direction)(jnp.asarray(pose_arr))
            )
            ends = pts + 0.2 * dirs
            geo["pose_points"] = pts
            geo["pose_direction_lines"] = np.stack([pts, ends], axis=1)
        return geo

    # -- presentation (Open3D-gated) --------------------------------------

    def _to_o3d(self):
        pc = _o3d.geometry.PointCloud()
        pc.points = _o3d.utility.Vector3dVector(self.points.astype(np.float64))
        if self.colors is not None:
            pc.colors = _o3d.utility.Vector3dVector(self.colors.astype(np.float64))
        return pc

    def _poisson_mesh(self, radius: float = 0.1, max_nn: int = 30, depth: int = 11):
        pc = self._to_o3d()
        pc.estimate_normals(
            search_param=_o3d.geometry.KDTreeSearchParamHybrid(radius=radius, max_nn=max_nn)
        )
        mesh, _ = _o3d.geometry.TriangleMesh.create_from_point_cloud_poisson(
            pc, depth=depth, scale=1.0
        )
        return mesh

    def _visualiser(self, geometry):  # pragma: no cover - interactive
        vis = _o3d.visualization.Visualizer()
        vis.create_window()
        vis.add_geometry(geometry)
        lines = [[0, 1], [1, 2], [2, 3], [3, 0], [4, 5], [5, 6], [6, 7], [7, 4],
                 [0, 4], [1, 5], [2, 6], [3, 7]]
        geo = self.overlay_geometry()

        def add_boxes(corner_sets, color):
            for corners8 in corner_sets:
                ls = _o3d.geometry.LineSet(
                    points=_o3d.utility.Vector3dVector(corners8.astype(np.float64)),
                    lines=_o3d.utility.Vector2iVector(lines),
                )
                ls.paint_uniform_color(color)
                vis.add_geometry(ls)

        add_boxes(geo["optimised_boxes"], [0, 1, 0])  # green (mapping.py:170-179)
        add_boxes(geo["raw_boxes"], [1, 0, 0])  # red raw (mapping.py:152-167)
        if geo["pose_points"] is not None:
            pc = _o3d.geometry.PointCloud()
            pc.points = _o3d.utility.Vector3dVector(geo["pose_points"].astype(np.float64))
            pc.paint_uniform_color([0, 0, 1])
            vis.add_geometry(pc)
            segs = geo["pose_direction_lines"]
            allpts = np.concatenate([segs[:, 0], segs[:, 1]])
            ray_lines = [[i, i + len(segs)] for i in range(len(segs))]
            ls = _o3d.geometry.LineSet(
                points=_o3d.utility.Vector3dVector(allpts.astype(np.float64)),
                lines=_o3d.utility.Vector2iVector(ray_lines),
            )
            ls.paint_uniform_color([1, 0, 0])
            vis.add_geometry(ls)
        vis.run()
        vis.destroy_window()


if __name__ == "__main__":  # standalone harness (reference mapping.py:209-261)
    import argparse
    import os
    import pickle

    from tpu3dlm.utils.config import ConfigLoader

    parser = argparse.ArgumentParser(description="Processing Configuration.")
    parser.add_argument("--data", type=str, default="gold_std")
    parser.add_argument("--model", type=str, default="mesh", choices=["mesh", "pc"])
    parser.add_argument("--config", type=str, default=os.path.join("configs", "variables.cfg"))
    args = parser.parse_args()
    cfg = ConfigLoader(args.config, args.data)

    with open(cfg.pickle_path, "rb") as f:
        variables = pickle.load(f)
    mapper = Mapping(
        global_bboxes_data=variables["global_bboxes_data"],
        optimised_bboxes=variables["optimised_bboxes"],
        pose=variables["pose_df"],
        eps=cfg.eps, min_points=cfg.min_points, ply_filepath=cfg.ply_path,
        preprocess_point_cloud=cfg.preprocess_point_cloud,
        overlay_pose=cfg.overlay_pose,
    )
    out = os.path.join(os.path.dirname(cfg.ply_path), f"map_{args.model}.ply")
    {"mesh": mapper.make_mesh, "pc": mapper.make_point_cloud}[args.model](output_path=out)
    print(f"map written to {out}")
