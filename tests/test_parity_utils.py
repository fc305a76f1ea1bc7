"""Parity-kit tests: Transforms/Visualiser adapters, RGBD→cloud unprojection,
PoseDataExtractor — the reference's L0 utility contracts (SURVEY.md §2b)."""

import jax.numpy as jnp
import numpy as np

from tpu3dlm.ops.pointcloud import depth_to_points, scan_to_pointcloud
from tpu3dlm.utils.transformations import Transforms
from tpu3dlm.utils.visualisation import Visualiser


class TestTransformsParity:
    def setup_method(self):
        self.t = Transforms()

    def test_transformation_matrix(self):
        T = self.t.get_transformation_matrix([1, 2, 3, 0, 0, 0, 1])
        np.testing.assert_allclose(T[:3, 3], [1, 2, 3], atol=1e-6)

    def test_translation_rotation(self):
        pose = [1, 2, 3, 0, 0, 0, 1]
        np.testing.assert_allclose(self.t.get_translation(pose), [1, 2, 3])
        np.testing.assert_allclose(self.t.get_rotation(pose), np.eye(3), atol=1e-6)

    def test_camera_direction_df(self):
        import pandas as pd

        df = pd.DataFrame(
            {"tx": [0.0], "ty": [0.0], "tz": [0.0],
             "qx": [0.0], "qy": [0.0], "qz": [0.0], "qw": [1.0]}
        )
        d = self.t.get_camera_direction(df)
        np.testing.assert_allclose(d, [[0, 0, 1]], atol=1e-6)

    def test_scale_bbox_preserves_extras(self):
        out = self.t.scale_bounding_box([10, 20, 30, 40, 0.9, 2], (100, 100), (50, 50))
        np.testing.assert_allclose(out[:4], [5, 10, 15, 20])
        assert out[4:] == [0.9, 2]

    def test_bbox_to_3d_corners(self):
        c = self.t.bbox_to_3d([1, 2, 3, 4])
        assert c.shape == (4, 2)

    def test_depth_to_3d_pixel(self):
        depth = np.full((10, 10), 2000.0, np.float32)
        p = self.t._depth_to_3d(5, 5, depth, 100.0, 100.0, 5.0, 5.0, 1000.0)
        np.testing.assert_allclose(p, [0, 0, 2.0], atol=1e-6)

    def test_create_3d_bounding_box(self):
        quad = [np.array([0, 0, 1.0]), np.array([0, 1, 1.0]),
                np.array([1, 1, 1.0]), np.array([1, 0, 1.0])]
        box = self.t.create_3d_bounding_box(quad, 0.05)
        assert box.shape == (8, 3)


class TestVisualiserParity:
    def setup_method(self):
        self.v = Visualiser()

    def test_parse_images_chw(self):
        rgb = np.random.rand(3, 8, 6).astype(np.float32)
        depth = np.random.rand(8, 6)
        r, d = self.v.parse_images(rgb, depth)
        assert r.shape == (8, 6, 3) and r.dtype == np.uint8
        assert d.dtype == np.float32

    def test_gen_point_cloud_matches_unprojection(self):
        depth_m = np.full((4, 4), 2.0, np.float32)
        rgb = np.full((4, 4, 3), 128, np.uint8)
        intr = {"fx": 10.0, "fy": 10.0, "cx": 2.0, "cy": 2.0}
        pts, cols = self.v.gen_point_cloud((rgb, depth_m), intr, np.eye(4))
        assert pts.shape == (16, 3)
        # centre pixel maps to (0, 0, 2)
        centre = pts[2 * 4 + 2]
        np.testing.assert_allclose(centre, [0, 0, 2], atol=1e-6)
        assert cols.shape == (16, 3)

    def test_overlay_helpers_no_open3d(self):
        box = self.v.overlay_3d_bbox(np.zeros((8, 3)), [1, 0, 0])
        assert "points" in box or hasattr(box, "points")
        pose = self.v.overlay_pose(np.zeros((5, 7)))
        rays = self.v.overlay_pose_directions(np.zeros((5, 3)), np.tile([0, 0, 1.0], (5, 1)))
        frustum = self.v._overlay_camera_frustum(
            np.zeros(3), np.eye(3), 100, 100, 192, 256
        )
        for g in (pose, rays, frustum):
            assert g is not None


class TestPointCloudOps:
    def test_depth_to_points_identity_pose(self):
        depth = jnp.full((4, 6), 3000.0)
        pts, valid = depth_to_points(depth, 10.0, 10.0, 3.0, 2.0)
        assert pts.shape == (24, 3) and bool(valid.all())
        centre = np.asarray(pts).reshape(4, 6, 3)[2, 3]
        np.testing.assert_allclose(centre, [0, 0, 3.0], atol=1e-6)

    def test_scan_to_pointcloud_world_frame(self):
        F, H, W = 2, 4, 4
        depth = jnp.full((F, H, W), 1000.0)
        intr = jnp.tile(jnp.array([10.0, 10.0, 2.0, 2.0]), (F, 1))
        wh = jnp.tile(jnp.array([4.0, 4.0]), (F, 1))
        poses = jnp.array(
            [[0, 0, 0, 0, 0, 0, 1], [5, 0, 0, 0, 0, 0, 1]], jnp.float32
        )
        pts, valid = scan_to_pointcloud(depth, intr, wh, poses)
        assert pts.shape == (F, 16, 3)
        # frame 1 translated +5 in x relative to frame 0
        np.testing.assert_allclose(
            np.asarray(pts[1, :, 0]) - np.asarray(pts[0, :, 0]), 5.0, atol=1e-5
        )

    def test_invalid_depth_masked(self):
        depth = jnp.zeros((2, 3))
        pts, valid = depth_to_points(depth, 10.0, 10.0, 1.0, 1.0)
        assert not bool(valid.any())


class TestPoseDataExtractor:
    def test_fetch_data(self, tmp_path):
        p = tmp_path / "poses.txt"
        p.write_text(
            "# header\n1.0 0 0 0 0 0 0 1 1\n2.0 1 0 0 0 0 0 1 2\n"
        )
        from tpu3dlm.data.poses import PoseDataExtractor

        df = PoseDataExtractor(str(p)).fetch_data()
        assert list(df.columns) == ["timestamp", "tx", "ty", "tz", "qx", "qy", "qz", "qw"]
        assert len(df) == 2


class TestToHost:
    def test_tree_structure_and_values(self):
        """Batched async d2h readback (utils/host.to_host) must return the
        same pytree with numpy leaves, for device arrays, numpy arrays,
        and scalars alike."""
        from tpu3dlm.utils.host import to_host

        tree = {
            "dev": jnp.arange(6.0).reshape(2, 3),
            "np": np.ones((2, 2), np.int32),
            "nested": (jnp.zeros(3), 4.5),
        }
        out = to_host(tree)
        assert isinstance(out["dev"], np.ndarray)
        np.testing.assert_array_equal(out["dev"], np.arange(6.0).reshape(2, 3))
        np.testing.assert_array_equal(out["np"], tree["np"])
        np.testing.assert_array_equal(out["nested"][0], np.zeros(3))
        assert float(out["nested"][1]) == 4.5


class TestConfigLoaderRobustness:
    def _write(self, tmp_path, body):
        p = str(tmp_path / "variables.cfg")
        with open(p, "w") as f:
            f.write(body)
        return p

    def test_percent_in_value(self, tmp_path):
        """'%' is legitimate in paths (URL-encoding, '5%_sample' dirs) —
        BasicInterpolation used to raise InterpolationSyntaxError."""
        from tpu3dlm.utils.config import ConfigLoader

        p = self._write(
            tmp_path,
            "[default]\nimage_dir = /data/5%_sample/rgb\n",
        )
        cfg = ConfigLoader(p, "gold_std")
        assert cfg.image_dir == "/data/5%_sample/rgb"

    def test_on_off_booleans(self, tmp_path):
        from tpu3dlm.utils.config import ConfigLoader

        p = self._write(tmp_path, "[default]\nvisualise = on\nview_img = off\n")
        cfg = ConfigLoader(p, "gold_std")
        assert cfg.visualise is True and cfg.view_img is False

    def test_bad_boolean_names_the_key(self, tmp_path):
        import pytest

        from tpu3dlm.utils.config import ConfigLoader

        p = self._write(tmp_path, "[default]\nvisualise = maybe\n")
        with pytest.raises(ValueError, match="visualise"):
            ConfigLoader(p, "gold_std")


class TestGoldStdLoad:
    def test_truncated_pickle_returns_none(self, tmp_path):
        """The documented contract is None on missing/corrupt; a truncated
        pickle raises EOFError which used to escape."""
        import pickle

        from tpu3dlm.pipeline.task import load_gold_std

        p = str(tmp_path / "variables.pkl")
        with open(p, "wb") as f:
            f.write(pickle.dumps({"predictions": {0: []}})[:10])  # truncate
        assert load_gold_std(p) is None
