"""Golden-value tests for the L0 geometry core (SURVEY.md §7 build step 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3dlm.ops import geometry as G

jax.config.update("jax_enable_x64", False)


def _random_quat(rng):
    q = rng.normal(size=4)
    return q / np.linalg.norm(q)


class TestQuaternions:
    def test_identity_quat(self):
        R = G.quat_to_rotmat(jnp.array([0.0, 0.0, 0.0, 1.0]))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_90deg_z(self):
        # 90° about z: q = (0, 0, sin45, cos45)
        s = np.sin(np.pi / 4)
        R = G.quat_to_rotmat(jnp.array([0.0, 0.0, s, s]))
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
        np.testing.assert_allclose(R, expected, atol=1e-6)

    def test_roundtrip_quat_rotmat(self, rng):
        for _ in range(20):
            q = _random_quat(rng).astype(np.float32)
            R = G.quat_to_rotmat(jnp.array(q))
            q2 = np.asarray(G.rotmat_to_quat(R))
            # q and -q are the same rotation
            assert min(np.abs(q - q2).max(), np.abs(q + q2).max()) < 1e-3

    def test_rotmat_orthonormal(self, rng):
        q = _random_quat(rng)
        R = np.asarray(G.quat_to_rotmat(jnp.array(q, dtype=jnp.float32)))
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.det(R) - 1.0) < 1e-5


class TestSE3:
    def test_pose_to_matrix_translation(self):
        pose = jnp.array([1.0, 2.0, 3.0, 0.0, 0.0, 0.0, 1.0])
        T = G.pose_to_matrix(pose)
        np.testing.assert_allclose(T[:3, 3], [1, 2, 3], atol=1e-6)
        np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)

    def test_invert_se3(self, rng):
        pose = jnp.array([0.5, -1.0, 2.0, *(_random_quat(rng))], dtype=jnp.float32)
        T = G.pose_to_matrix(pose)
        Ti = G.invert_se3(T)
        np.testing.assert_allclose(np.asarray(T @ Ti), np.eye(4), atol=1e-5)

    def test_transform_points_matches_homogeneous(self, rng):
        pose = jnp.array([0.5, -1.0, 2.0, *(_random_quat(rng))], dtype=jnp.float32)
        T = np.asarray(G.pose_to_matrix(pose))
        pts = rng.normal(size=(7, 3)).astype(np.float32)
        got = np.asarray(G.transform_points(jnp.array(T), jnp.array(pts)))
        hom = np.concatenate([pts, np.ones((7, 1), np.float32)], axis=1)
        want = (T @ hom.T).T[:, :3]
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_camera_direction_identity(self):
        pose = jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0])
        d = G.camera_direction(pose)
        np.testing.assert_allclose(d, [0, 0, 1], atol=1e-6)


class TestSO3LogExp:
    def test_log_exp_roundtrip(self, rng):
        for _ in range(10):
            w = rng.normal(size=3).astype(np.float32) * 0.8
            R = G.so3_exp(jnp.array(w))
            w2 = np.asarray(G.so3_log(R))
            np.testing.assert_allclose(w2, w, atol=1e-4)

    def test_exp_small_angle(self):
        R = G.so3_exp(jnp.array([1e-9, 0.0, 0.0]))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_log_near_and_at_pi(self):
        """Regression: the skew-part-only log returned [0,0,0] for a 180°
        rotation (w = (R−Rᵀ)∨ cancels while the rotation is maximal), so
        se3_interpolate replays of turned-around scans silently dropped
        the rotation. The full-range log must recover θ≈π exactly, for
        axis-aligned AND oblique axes."""
        for axis in ([1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0], [0.3, -0.8, 0.52]):
            u = np.asarray(axis, np.float64)
            u /= np.linalg.norm(u)
            for theta in (np.pi, np.deg2rad(179.9), np.deg2rad(173.0)):
                R = np.asarray(G.so3_exp(jnp.array(u * theta, dtype=jnp.float32)))
                w = np.asarray(G.so3_log(jnp.array(R)))
                # f32 arccos conditioning near ±1 bounds angle accuracy to
                # ~sqrt(eps) ≈ 5e-4 rad (0.03°) — far below the [0,0,0]
                # failure this guards against
                assert abs(np.linalg.norm(w) - theta) < 2e-3
                R2 = np.asarray(G.so3_exp(jnp.array(w)))
                np.testing.assert_allclose(R2, R, atol=2e-3)

    def test_se3_interpolate_halves_a_180_turn(self):
        """Half of a 180° turn-in-place must compose back to the full turn
        (the flipped-scan animation contract: alignment/visualise.py
        replays the PCA init's big-rotation step through this)."""
        R = np.asarray(G.so3_exp(jnp.array([0.0, 0.0, np.pi], jnp.float32)))
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = [1.0, 2.0, 0.0]
        H = np.asarray(G.se3_interpolate(jnp.array(T), jnp.float32(0.5)))
        np.testing.assert_allclose(H @ H, T, atol=1e-4)

    def test_se3_interpolate_full_is_identity_transform(self, rng):
        pose = jnp.array([0.3, 0.1, -0.4, *(_random_quat(rng))], dtype=jnp.float32)
        T = G.pose_to_matrix(pose)
        np.testing.assert_allclose(
            np.asarray(G.se3_interpolate(T, jnp.float32(1.0))), np.asarray(T), atol=1e-4
        )

    def test_se3_interpolate_compose(self, rng):
        # T^(1/2) @ T^(1/2) == T
        pose = jnp.array([0.3, 0.1, -0.4, *(_random_quat(rng))], dtype=jnp.float32)
        T = G.pose_to_matrix(pose)
        H = np.asarray(G.se3_interpolate(T, jnp.float32(0.5)))
        np.testing.assert_allclose(H @ H, np.asarray(T), atol=1e-4)

    def test_se3_interpolate_pure_translation(self):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [2.0, -4.0, 6.0]
        H = np.asarray(G.se3_interpolate(jnp.array(T), jnp.float32(0.25)))
        np.testing.assert_allclose(H[:3, 3], [0.5, -1.0, 1.5], atol=1e-5)
        np.testing.assert_allclose(H[:3, :3], np.eye(3), atol=1e-6)


class TestBBox:
    def test_scale_bbox(self):
        bbox = jnp.array([100.0, 200.0, 300.0, 400.0])
        out = G.scale_bbox(bbox, jnp.array([1920.0, 1440.0]), jnp.array([192.0, 256.0]))
        np.testing.assert_allclose(out, [10.0, 200 * 256 / 1440, 30.0, 400 * 256 / 1440], rtol=1e-5)

    def test_bbox_corners_order(self):
        c = np.asarray(G.bbox_corners_2d(jnp.array([1.0, 2.0, 3.0, 4.0])))
        np.testing.assert_allclose(c, [[1, 2], [1, 4], [3, 4], [3, 2]])

    def test_create_3d_bounding_box(self):
        # planar quad in z=0 plane
        quad = jnp.array(
            [[0.0, 0.0, 0.0], [0.0, 1.0, 0.0], [1.0, 1.0, 0.0], [1.0, 0.0, 0.0]]
        )
        box = np.asarray(G.create_3d_bounding_box(quad, 0.1))
        assert box.shape == (8, 3)
        # normal of (v1=+y, v2=+x) is -z: front at +0.1, back at -0.1
        zs = sorted(set(np.round(box[:, 2], 6)))
        assert zs == [-0.1, 0.1]


class TestMaskedMedian:
    def test_matches_numpy_median_odd(self, rng):
        v = rng.normal(size=(9,)).astype(np.float32)
        med, valid = G.masked_median(jnp.array(v), jnp.ones(9, bool))
        assert bool(valid)
        np.testing.assert_allclose(float(med), np.median(v), rtol=1e-6)

    def test_matches_numpy_median_even_subset(self, rng):
        v = rng.normal(size=(10,)).astype(np.float32)
        mask = np.zeros(10, bool)
        mask[2:8] = True
        med, valid = G.masked_median(jnp.array(v), jnp.array(mask))
        np.testing.assert_allclose(float(med), np.median(v[mask]), rtol=1e-6)

    def test_empty_mask_invalid(self):
        med, valid = G.masked_median(jnp.zeros(5), jnp.zeros(5, bool))
        assert not bool(valid)

    def test_bbox_median_depth(self):
        depth = np.zeros((8, 8), np.float32)
        depth[2:5, 2:5] = np.arange(1, 10).reshape(3, 3)
        med, valid = G.bbox_median_depth(jnp.array(depth), jnp.array([2.0, 2.0, 4.0, 4.0]))
        assert bool(valid)
        assert float(med) == 5.0  # median of 1..9

    def test_bbox_median_ignores_zero_depth(self):
        depth = np.zeros((8, 8), np.float32)
        depth[2, 2] = 3.0  # only one valid pixel in box
        med, valid = G.bbox_median_depth(jnp.array(depth), jnp.array([0.0, 0.0, 7.0, 7.0]))
        assert bool(valid)
        assert float(med) == 3.0


class TestUnproject:
    def test_principal_point_center(self):
        p = np.asarray(G.unproject(jnp.float32(96.0), jnp.float32(128.0), jnp.float32(2.0), 100.0, 100.0, 96.0, 128.0))
        np.testing.assert_allclose(p, [0.0, 0.0, 2.0], atol=1e-6)

    def test_pinhole_equations(self):
        p = np.asarray(G.unproject(jnp.float32(120.0), jnp.float32(80.0), jnp.float32(1.5), 200.0, 210.0, 96.0, 128.0))
        np.testing.assert_allclose(p, [(120 - 96) * 1.5 / 200, (80 - 128) * 1.5 / 210, 1.5], rtol=1e-6)

    def test_vmapped_unproject(self, rng):
        px = jnp.array(rng.uniform(0, 192, size=16), dtype=jnp.float32)
        py = jnp.array(rng.uniform(0, 256, size=16), dtype=jnp.float32)
        z = jnp.array(rng.uniform(0.5, 5.0, size=16), dtype=jnp.float32)
        out = jax.vmap(lambda a, b, c: G.unproject(a, b, c, 100.0, 100.0, 96.0, 128.0))(px, py, z)
        assert out.shape == (16, 3)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestSampledMedian:
    def test_matches_exact_on_constant_region(self):
        depth = np.full((64, 48), 2500.0, np.float32)
        depth[10:30, 10:30] = 1200.0
        bbox = jnp.array([12.0, 12.0, 28.0, 28.0])
        exact, v1 = G.bbox_median_depth(jnp.array(depth), bbox)
        sampled, v2 = G.bbox_sampled_median_depth(jnp.array(depth), bbox)
        assert bool(v1) and bool(v2)
        assert float(exact) == float(sampled) == 1200.0

    def test_close_on_gradient_region(self, rng):
        ys = np.linspace(1000, 3000, 64, dtype=np.float32)
        depth = np.tile(ys[:, None], (1, 48))
        bbox = jnp.array([5.0, 8.0, 40.0, 56.0])
        exact, _ = G.bbox_median_depth(jnp.array(depth), bbox)
        sampled, _ = G.bbox_sampled_median_depth(jnp.array(depth), bbox)
        assert abs(float(exact) - float(sampled)) / float(exact) < 0.03

    def test_ignores_holes(self):
        depth = np.full((32, 32), 2000.0, np.float32)
        depth[8:12, 8:12] = 0.0  # hole inside box
        sampled, valid = G.bbox_sampled_median_depth(
            jnp.array(depth), jnp.array([6.0, 6.0, 20.0, 20.0])
        )
        assert bool(valid) and float(sampled) == 2000.0

    def test_all_invalid(self):
        depth = jnp.zeros((16, 16))
        _, valid = G.bbox_sampled_median_depth(depth, jnp.array([2.0, 2.0, 8.0, 8.0]))
        assert not bool(valid)
