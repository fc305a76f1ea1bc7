"""Drive every Open3D-gated presentation branch through the test double
(tests/o3d_stub.py) — VERDICT r3 task 7: with Open3D absent from this
image, these branches were unexecutable-by-construction; now each one runs
in CI and its behavior (geometry counts, colors, windowing call order) is
pinned.

Reference parity targets: the interactive map view with red/raw + green/
optimised boxes and pose overlays (src/mapper/mapping.py:139-197), the
pose trajectory plot (src/mapper/database_query.py:27-46), and the live
frame display with box rectangles (src/mapper/pose_processor.py:159-167).
"""

from __future__ import annotations

import numpy as np
import pytest

from tests import o3d_stub


@pytest.fixture()
def o3d(monkeypatch):
    """Install the stub as `open3d` and into the modules that captured the
    import at module load."""
    import sys

    import tpu3dlm.mapper.mapping as mapping_mod
    import tpu3dlm.utils.visualisation as vis_mod

    o3d_stub.reset()
    monkeypatch.setitem(sys.modules, "open3d", o3d_stub)
    monkeypatch.setattr(vis_mod, "_o3d", o3d_stub)
    monkeypatch.setattr(mapping_mod, "_o3d", o3d_stub)
    return o3d_stub


def _quad(off=0.0):
    return [np.array([i * 0.1 + off, 0.0, 3.0], np.float32) for i in range(4)]


class TestVisualiserO3DBranches:
    def test_overlay_3d_bbox_returns_lineset(self, o3d):
        from tpu3dlm.utils.visualisation import Visualiser

        corners8 = np.concatenate([np.stack(_quad()), np.stack(_quad()) + [0, 0, 0.05]])
        ls = Visualiser().overlay_3d_bbox(corners8, (0, 1, 0))
        assert isinstance(ls, o3d.geometry.LineSet)
        assert len(ls.points) == 8 and len(ls.lines) == 12
        assert ls.color == [0, 1, 0]

    def test_overlay_pose_and_directions(self, o3d):
        from tpu3dlm.utils.visualisation import Visualiser

        poses = np.tile(np.array([1.0, 2.0, 3.0, 0, 0, 0, 1], np.float32), (5, 1))
        vis = Visualiser()
        pc = vis.overlay_pose(poses)
        assert isinstance(pc, o3d.geometry.PointCloud)
        assert len(pc.points) == 5 and pc.color == [0, 0, 1]

        dirs = np.tile(np.array([0.0, 0.0, 1.0]), (5, 1))
        rays = vis.overlay_pose_directions(poses[:, :3], dirs)
        assert isinstance(rays, o3d.geometry.LineSet)
        assert len(rays.points) == 10 and len(rays.lines) == 5

    def test_camera_frustum(self, o3d):
        from tpu3dlm.utils.visualisation import Visualiser

        ls = Visualiser()._overlay_camera_frustum(
            t=np.zeros(3), R=np.eye(3), fx=100.0, fy=100.0, width=64, height=48
        )
        assert isinstance(ls, o3d.geometry.LineSet)
        assert len(ls.points) == 5 and len(ls.lines) == 8  # apex + 4 corners

    def test_display_imgs_draws_boxes(self, o3d, monkeypatch):
        """The live-frame display path (reference pose_processor.py:159-167):
        drive it with cv2 windowing doubled out, assert the boxes were
        drawn on the shown image."""
        import cv2

        shown = {}
        monkeypatch.setattr(cv2, "imshow", lambda name, img: shown.update(img=img, name=name))
        monkeypatch.setattr(cv2, "waitKey", lambda *_: 0)
        monkeypatch.setattr(cv2, "destroyAllWindows", lambda: None)

        from tpu3dlm.utils.visualisation import Visualiser

        rgb = np.zeros((32, 32, 3), np.uint8)
        Visualiser().display_imgs(rgb, np.ones((32, 32), np.float32),
                                  bboxes=[[4, 4, 20, 20, 0.9, 1]], frame_index=3)
        assert shown["name"] == "frame 3"
        assert shown["img"].any()  # the rectangle was drawn
        assert not rgb.any()  # on a copy, not the caller's buffer


class TestMappingInteractiveBranches:
    def _mapping(self, tmp_path, **kw):
        from tpu3dlm.data.ply import save_ply
        from tpu3dlm.mapper.mapping import Mapping

        rng = np.random.default_rng(0)
        pts = rng.uniform(-1, 1, (400, 3)).astype(np.float32)
        pts[:, 2] = 3.0  # a wall
        ply = str(tmp_path / "cloud.ply")
        save_ply(ply, pts, None)
        boxes = {0: [_quad() + [0, 0.9, 1]]}
        opt = {0: [_quad(0.05) + [0, 0.9, 1]]}
        poses = np.tile(np.array([0, 0, 0, 0, 0, 0, 1], np.float32), (3, 1))
        return Mapping(boxes, opt, poses, ply_filepath=ply,
                       preprocess_point_cloud=False, overlay_pose=True, **kw)

    def test_make_point_cloud_runs_visualiser(self, o3d, tmp_path):
        m = self._mapping(tmp_path)
        m.make_point_cloud()
        methods = [c[0] for c in o3d.CALLS]
        assert "create_window" in methods and "run" in methods
        assert methods.index("run") < methods.index("destroy_window")
        # point cloud + raw/optimised box line sets + pose overlays all added
        added = [c[1] for c in o3d.CALLS if c[0] == "add_geometry"]
        assert "PointCloud" in added and added.count("LineSet") >= 2

    def test_make_mesh_runs_poisson_and_visualiser(self, o3d, tmp_path):
        m = self._mapping(tmp_path)
        m.make_mesh(voxel=0.25)
        methods = [c[0] for c in o3d.CALLS]
        # the presentation extra meshes via the (stubbed) Open3D Poisson
        # recipe: normals estimation precedes the poisson factory
        assert "estimate_normals" in methods and "poisson" in methods
        assert methods.index("estimate_normals") < methods.index("poisson")
        added = [c[1] for c in o3d.CALLS if c[0] == "add_geometry"]
        assert "TriangleMesh" in added

    def test_pose_plot(self, o3d, tmp_path):
        from tpu3dlm.data.poses import PoseDataExtractor

        pose_path = tmp_path / "poses.txt"
        with open(pose_path, "w") as f:
            f.write("# timestamp x y z qx qy qz qw id\n")
            for i in range(4):
                f.write(f"{1700000000 + i}.0 {i * 0.1} 0 0 0 0 0 1 {i + 1}\n")
        ex = PoseDataExtractor(str(pose_path))
        df = ex.fetch_data()
        ex.plot_pose(df)
        assert ("draw_geometries", 2) in o3d.CALLS  # cloud + direction rays
