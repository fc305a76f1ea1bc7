"""Visualiser kit — parity with the snapshot-missing ``src/utils/
visualisation.py::Visualiser`` (contract: SURVEY.md §2b).

Analysis-adjacent methods (image parsing, RGBD assembly, point-cloud
generation, box/pose geometry) are dependency-free numpy/JAX; interactive
Open3D rendering methods degrade to no-ops with a warning when Open3D is
absent (it is not part of the TPU image — presentation only, SURVEY.md §2c).
"""

from __future__ import annotations

import logging

import numpy as np

try:
    import open3d as _o3d
except Exception:  # pragma: no cover
    _o3d = None

_BOX_EDGES = [
    [0, 1], [1, 2], [2, 3], [3, 0],
    [4, 5], [5, 6], [6, 7], [7, 4],
    [0, 4], [1, 5], [2, 6], [3, 7],
]


class Visualiser:
    def __init__(self):
        self.logger = logging.getLogger(__name__)

    # -- analysis-side helpers (always available) --------------------------

    def parse_images(self, rgb_tensor, depth_tensor):
        """Model tensors → numpy images (reference pose_processor.py:94-97).

        Accepts (H, W, 3) uint8/float arrays or torch-style (3, H, W)."""
        rgb = np.asarray(rgb_tensor)
        if rgb.ndim == 3 and rgb.shape[0] in (1, 3) and rgb.shape[-1] not in (1, 3):
            rgb = np.moveaxis(rgb, 0, -1)
        if rgb.dtype != np.uint8:
            rgb = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
        depth = np.asarray(depth_tensor, np.float32)
        return rgb, depth

    def gen_rgbd(self, rgb_image, depth_image, scale_depth: float = 1000.0):
        """→ (rgb uint8, depth float32 metres) pair ("RGBD image")."""
        rgb, depth = self.parse_images(rgb_image, depth_image)
        return rgb, depth / scale_depth

    def gen_point_cloud(self, rgbd, intrinsics: dict, extrinsics: np.ndarray):
        """RGBD + intrinsics + world→camera extrinsics → (N, 3) world points
        + (N, 3) colors (valid-depth pixels only)."""
        rgb, depth_m = rgbd
        h, w = depth_m.shape
        fx, fy, cx, cy = (
            intrinsics["fx"], intrinsics["fy"], intrinsics["cx"], intrinsics["cy"]
        )
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        z = depth_m
        X = (xs - cx) * z / fx
        Y = (ys - cy) * z / fy
        pts_cam = np.stack([X, Y, z], axis=-1).reshape(-1, 3)
        valid = (z > 1e-6).reshape(-1)
        T = np.linalg.inv(np.asarray(extrinsics))  # camera→world
        pts = pts_cam @ T[:3, :3].T + T[:3, 3]
        cols = None
        if rgb.shape[:2] == depth_m.shape:
            cols = rgb.reshape(-1, 3)[valid] / 255.0
        return pts[valid], cols

    def overlay_3d_bbox(self, corners8: np.ndarray, color_rgb):
        """8-corner box → line set. Open3D LineSet when available, else a
        dict {points, lines, color} with the same geometry."""
        corners8 = np.asarray(corners8, np.float64)
        if _o3d is not None:
            ls = _o3d.geometry.LineSet(
                points=_o3d.utility.Vector3dVector(corners8),
                lines=_o3d.utility.Vector2iVector(_BOX_EDGES),
            )
            ls.paint_uniform_color(list(color_rgb))
            return ls
        return {"points": corners8, "lines": list(_BOX_EDGES), "color": list(color_rgb)}

    def overlay_pose(self, pose_df):
        """Trajectory positions as a point cloud (reference mapping.py:183)."""
        pts = np.asarray(pose_df[["tx", "ty", "tz"]]) if hasattr(pose_df, "columns") \
            else np.asarray(pose_df)[:, :3]
        if _o3d is not None:
            pc = _o3d.geometry.PointCloud()
            pc.points = _o3d.utility.Vector3dVector(pts.astype(np.float64))
            pc.paint_uniform_color([0, 0, 1])
            return pc
        return {"points": pts}

    def overlay_pose_directions(self, points, directions, length: float = 0.2):
        """Camera direction rays from each pose position."""
        pts = np.asarray(points)
        if not isinstance(pts, np.ndarray) or pts.dtype == object:
            pts = np.asarray(list(points))
        dirs = np.asarray(directions)
        ends = pts + dirs * length
        allpts = np.concatenate([pts, ends])
        lines = [[i, i + len(pts)] for i in range(len(pts))]
        if _o3d is not None:
            ls = _o3d.geometry.LineSet(
                points=_o3d.utility.Vector3dVector(allpts.astype(np.float64)),
                lines=_o3d.utility.Vector2iVector(lines),
            )
            ls.paint_uniform_color([1, 0, 0])
            return ls
        return {"points": allpts, "lines": lines}

    def _overlay_camera_frustum(self, t, R, fx, fy, width, height, depth: float = 0.3):
        """Frustum line geometry for a camera pose (pose_processor.py:227-234)."""
        corners_px = np.array(
            [[0, 0], [width, 0], [width, height], [0, height]], np.float32
        )
        cx, cy = width / 2.0, height / 2.0
        rays = np.stack(
            [(corners_px[:, 0] - cx) / fx, (corners_px[:, 1] - cy) / fy,
             np.ones(4, np.float32)],
            axis=1,
        ) * depth
        world = rays @ np.asarray(R).T + np.asarray(t)
        pts = np.concatenate([[np.asarray(t)], world])
        lines = [[0, 1], [0, 2], [0, 3], [0, 4], [1, 2], [2, 3], [3, 4], [4, 1]]
        if _o3d is not None:
            ls = _o3d.geometry.LineSet(
                points=_o3d.utility.Vector3dVector(pts.astype(np.float64)),
                lines=_o3d.utility.Vector2iVector(lines),
            )
            return ls
        return {"points": pts, "lines": lines}

    # -- interactive (gated) -----------------------------------------------

    def display_imgs(self, rgb, depth, bboxes=None, frame_index=None):  # pragma: no cover
        try:
            import cv2

            img = np.asarray(rgb).copy()
            for b in bboxes or []:
                x1, y1, x2, y2 = (int(v) for v in b[:4])
                cv2.rectangle(img, (x1, y1), (x2, y2), (0, 255, 0), 2)
            cv2.imshow(f"frame {frame_index}", img)
            cv2.waitKey(0)
            cv2.destroyAllWindows()
        except Exception as e:
            self.logger.warning("display unavailable: %s", e)
