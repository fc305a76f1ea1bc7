"""Software renderer + mesh-rendered alignment animation + mapping overlay
geometry tests (reference presentation surfaces: mapping.py:139-197,
visualise.py:144-180 — rebuilt dependency-free)."""

import numpy as np
import pytest

from tpu3dlm.utils.render import look_at, orbit_eye, render_mesh, render_scene


class TestLookAt:
    def test_center_projects_forward(self):
        view = look_at(np.array([0.0, 0.0, -5.0]), np.zeros(3))
        cam = np.zeros(3) @ view[:3, :3].T + view[:3, 3]
        np.testing.assert_allclose(cam, [0, 0, 5], atol=1e-6)

    def test_top_down_view_not_degenerate(self):
        """Regression: view direction parallel to the default up vector
        made right = f×u = 0 and the view matrix rank-1 — a top-down orbit
        frame must still be a proper rotation."""
        view = look_at(np.array([0.0, -5.0, 0.0]), np.zeros(3))
        R = view[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.det(R) - 1.0) < 1e-4

    def test_rigid(self):
        view = look_at(np.array([1.0, 2.0, -3.0]), np.array([0.5, -0.2, 4.0]))
        R = view[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-5)


class TestRenderMesh:
    def _tri(self, z, scale=1.0):
        verts = np.array(
            [[-scale, -scale, z], [scale, -scale, z], [0, scale, z]], np.float32
        )
        return verts, np.array([[0, 1, 2]], np.int32)

    def test_draws_triangle(self):
        verts, faces = self._tri(z=0.0, scale=1.0)
        view = look_at(np.array([0, 0, -4.0]), np.zeros(3))
        img = render_mesh(verts, faces, np.array([[1.0, 0.0, 0.0]]), view, (64, 64))
        drawn = img.reshape(-1, 3) != 255
        assert drawn.any()
        # drawn pixels are red-ish (shaded red albedo: r > g = b)
        px = img[(img[..., 0] != 255) | (img[..., 1] != 255) | (img[..., 2] != 255)]
        assert (px[:, 0] > px[:, 1]).all()

    def test_occlusion(self):
        """Near triangle hides the far one at the image centre."""
        near_v, near_f = self._tri(z=-1.0, scale=0.8)
        far_v, far_f = self._tri(z=1.0, scale=2.0)
        view = look_at(np.array([0, 0, -5.0]), np.zeros(3))
        img = render_scene(
            [(far_v, far_f, (0.0, 1.0, 0.0)), (near_v, near_f, (1.0, 0.0, 0.0))],
            view,
            (65, 65),
            lattice_level=24,
        )
        c = img[32, 32]
        assert c[0] > c[1], f"centre pixel {c} should be red (near tri wins)"

    def test_occlusion_across_splat_offsets(self):
        """Regression: per-(dy,dx) splat passes let a FAR sample's offset
        overwrite a NEAR sample's pixel from an earlier pass — every
        overlapping pixel must keep the near triangle's color."""
        near_v, near_f = self._tri(z=-1.0, scale=0.8)
        far_v, far_f = self._tri(z=1.0, scale=2.0)
        view = look_at(np.array([0, 0, -5.0]), np.zeros(3))
        img = render_scene(
            [(far_v, far_f, (0.0, 1.0, 0.0)), (near_v, near_f, (1.0, 0.0, 0.0))],
            view, (65, 65), lattice_level=24, splat=3,
        )
        # inspect the interior of the near triangle's projection: NO pixel
        # there may be green (far triangle showing through)
        patch = img[28:37, 28:37].reshape(-1, 3)
        drawn = patch[(patch != 255).any(axis=1)]
        assert len(drawn) > 0
        assert (drawn[:, 0] > drawn[:, 1]).all(), "far color bled through splat"

    def test_vertex_behind_camera_keeps_frame(self):
        """Regression: one vertex at/behind the camera plane collapsed the
        auto-focal to ~0 (everything projected to a dot). The in-front
        geometry must still be framed and drawn."""
        verts = np.array(
            [[-1, -1, 2.0], [1, -1, 2.0], [0, 1, 2.0],  # in front
             [0, 0, -1.0], [0.5, 0, -1.0], [0, 0.5, -1.0]],  # behind
            np.float32,
        )
        faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        view = np.eye(4, dtype=np.float32)  # camera at origin looking +z
        img = render_mesh(
            verts, faces, np.array([[1.0, 0, 0], [0, 1.0, 0]]), view, (64, 64)
        )
        drawn = (img != 255).any(axis=-1)
        # the in-front triangle spans a real extent of the image, not a dot
        ys, xs = np.nonzero(drawn)
        assert drawn.sum() > 20
        assert np.ptp(xs) > 10 and np.ptp(ys) > 10

    def test_empty_mesh(self):
        img = render_mesh(
            np.zeros((0, 3)), np.zeros((0, 3), np.int32), np.zeros((0, 3)),
            look_at(np.array([0, 0, -1.0]), np.zeros(3)), (16, 16),
        )
        assert (img == 255).all()


class TestMeshAnimation:
    @pytest.fixture(scope="class")
    def clouds(self, ):
        rng = np.random.default_rng(0)

        def wall(shift):
            return np.stack(
                [rng.uniform(-1, 1, 3000), rng.uniform(-0.5, 0.5, 3000),
                 np.full(3000, 2.0)], axis=1
            ).astype(np.float32) + np.asarray(shift, np.float32)

        return wall((0, 0, 0)), wall((0.4, 0.1, 0.0))

    def test_mesh_mode_renders(self, clouds, tmp_path):
        from tpu3dlm.alignment.visualise import VisualiseAlignment

        base, comp = clouds
        vis = VisualiseAlignment(base, comp, image_hw=(64, 96))
        assert vis.uses_mesh, "wall clouds must mesh"
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [-0.4, -0.1, 0.0]
        n = vis.create_video([T], output_video=str(tmp_path / "a.mp4"), steps=4)
        assert n == 4
        assert vis.frames[0].shape == (64, 96, 3)
        # shaded meshes actually drawn
        assert (vis.frames[0] < 250).mean() > 0.01
        # the comparison mesh moved between first and last frame
        assert (vis.frames[0] != vis.frames[-1]).any()

    def test_splat_fallback(self, tmp_path):
        from tpu3dlm.alignment.visualise import VisualiseAlignment

        # two points cannot mesh → auto falls back to the splat renderer
        vis = VisualiseAlignment(
            np.zeros((2, 3), np.float32), np.ones((2, 3), np.float32),
            image_hw=(32, 32),
        )
        assert not vis.uses_mesh
        n = vis.create_video([np.eye(4, dtype=np.float32)],
                             output_video=str(tmp_path / "b.mp4"), steps=2)
        assert n == 2


class TestFrameViewGeometry:
    def test_cloud_boxes_frustum(self, tmp_path_factory):
        """Projection-time live-display geometry (reference
        pose_processor.py:144-171, 219-238): world cloud + extruded boxes +
        camera frustum, all dependency-free."""
        import os

        from tpu3dlm.data import synthetic
        from tpu3dlm.data.dataset import load_scan
        from tpu3dlm.data.scan import detections_from_frame_dict
        from tpu3dlm.mapper import project_detections
        from tpu3dlm.mapper.projection import frame_view_geometry

        root = str(tmp_path_factory.mktemp("fvg"))
        scene = synthetic.generate_scan(root, "gold_std", num_frames=2)
        base = os.path.join(root, "gold_std", "rtabmap_extract")
        scan = load_scan(
            image_dir=os.path.join(base, "data_rgb"),
            depth_image_dir=os.path.join(base, "data_depth"),
            calibration_dir=os.path.join(base, "calibration"),
            pose_path=os.path.join(root, "gold_std", "poses.txt"),
            img_size=128,
        )
        det = detections_from_frame_dict(scene.gt_boxes_2d, scan.num_frames)
        g = project_detections(scan, det)
        geo = frame_view_geometry(scan, g, frame_index=0)

        # the unprojected cloud lies on the wall/sign planes (z in [2.8, 3])
        z = geo["cloud_points"][:, 2]
        assert len(z) > 1000
        assert z.min() > 2.7 and z.max() < 3.1
        assert len(geo["boxes"]) == int(np.asarray(g.mask)[0].sum())
        for box8 in geo["boxes"]:
            assert box8.shape == (8, 3)
        fr = geo["frustum"]
        assert np.asarray(fr["points"]).shape == (5, 3)
        assert len(fr["lines"]) == 8
        # frustum apex sits at the camera position
        np.testing.assert_allclose(
            np.asarray(fr["points"])[0], np.asarray(scan.poses)[0, :3], atol=1e-5
        )


class TestMappingOverlays:
    @pytest.fixture(scope="class")
    def mapper(self, tmp_path_factory, rng):
        from tpu3dlm.data.ply import save_ply
        from tpu3dlm.mapper.mapping import Mapping

        path = str(tmp_path_factory.mktemp("ply") / "cloud.ply")
        save_ply(path, rng.uniform(0, 1, size=(200, 3)).astype(np.float32))
        quad = [np.array([0.0, 0, 2]), np.array([0.0, 1, 2]),
                np.array([1.0, 1, 2]), np.array([1.0, 0, 2])]
        boxes = {0: [quad + [0, 0.9, 1]]}
        raw_boxes = {0: [quad + [0, 0.9, 1], quad + [0, 0.8, 1]]}
        poses = np.tile(np.array([0, 0, 0, 0, 0, 0, 1], np.float32), (3, 1))
        poses[:, 0] = [0.0, 0.5, 1.0]
        return Mapping(
            global_bboxes_data=raw_boxes,
            optimised_bboxes=boxes,
            pose=poses,
            ply_filepath=path,
            preprocess_point_cloud=False,
            overlay_pose=True,
            view_unprocessed_bboxes=True,
        )

    def test_overlay_geometry_complete(self, mapper):
        geo = mapper.overlay_geometry()
        assert len(geo["optimised_boxes"]) == 1
        assert len(geo["raw_boxes"]) == 2  # red raw set (mapping.py:152-167)
        assert geo["optimised_boxes"][0].shape == (8, 3)
        assert geo["pose_points"].shape == (3, 3)
        segs = geo["pose_direction_lines"]
        assert segs.shape == (3, 2, 3)
        # direction rays have the configured 0.2 length
        np.testing.assert_allclose(
            np.linalg.norm(segs[:, 1] - segs[:, 0], axis=1), 0.2, atol=1e-5
        )
        # identity-quaternion camera looks along +z
        np.testing.assert_allclose(
            (segs[0, 1] - segs[0, 0]) / 0.2, [0, 0, 1], atol=1e-5
        )

    def test_overlays_respect_flags(self, mapper):
        import dataclasses  # noqa: F401  (Mapping is a plain class)

        mapper.view_unprocessed_bboxes = False
        mapper.overlay_pose = False
        geo = mapper.overlay_geometry()
        assert geo["raw_boxes"] == []
        assert geo["pose_points"] is None
        mapper.view_unprocessed_bboxes = True
        mapper.overlay_pose = True
