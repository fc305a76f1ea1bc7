"""L4 tests: nearest-neighbour kernel, ICP registration, auction matching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from tpu3dlm.ops.icp import centroid_align, icp, kabsch
from tpu3dlm.ops.matching import auction_assign, match_report
from tpu3dlm.ops.pallas.pairwise import nearest_neighbors_xla


def _brute_nn(a, b):
    d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    return d2.argmin(1), d2.min(1)


class TestNearestNeighbors:
    def test_xla_matches_bruteforce(self, rng):
        a = rng.normal(size=(300, 3)).astype(np.float32)
        b = rng.normal(size=(257, 3)).astype(np.float32)
        idx, d2 = nearest_neighbors_xla(jnp.array(a), jnp.array(b))
        widx, wd2 = _brute_nn(a, b)
        np.testing.assert_array_equal(np.asarray(idx), widx)
        np.testing.assert_allclose(np.asarray(d2), wd2, rtol=1e-4, atol=1e-5)

    def test_pallas_interpret_matches_bruteforce(self, rng):
        from jax.experimental.pallas import tpu as pltpu

        from tpu3dlm.ops.pallas.pairwise import nearest_neighbors_pallas

        a = rng.normal(size=(100, 3)).astype(np.float32)
        b = rng.normal(size=(600, 3)).astype(np.float32)
        with pltpu.force_tpu_interpret_mode():
            idx, d2 = nearest_neighbors_pallas(
                jnp.array(a), jnp.array(b), tile_n=64, tile_m=128
            )
        widx, wd2 = _brute_nn(a, b)
        np.testing.assert_array_equal(np.asarray(idx), widx)
        np.testing.assert_allclose(np.asarray(d2), wd2, rtol=1e-4, atol=1e-5)


class TestNormals:
    def test_plane_normals(self, rng):
        from tpu3dlm.ops.pointcloud import estimate_normals_grid

        pts = np.stack(
            [rng.uniform(-1, 1, 2000), rng.uniform(-1, 1, 2000), np.zeros(2000)],
            axis=1,
        ).astype(np.float32)
        n = estimate_normals_grid(pts, voxel=0.2)
        np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-3)
        np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)

    def test_degenerate_inputs(self):
        """Empty and 1-2-point clouds must not crash the numpy fallback
        (zero-size reduction / NaN covariance → eigh non-convergence) —
        they return unit normals of matching length."""
        from tpu3dlm.ops.pointcloud import estimate_normals_grid

        assert estimate_normals_grid(np.zeros((0, 3), np.float32)).shape == (0, 3)
        for k in (1, 2):
            n = estimate_normals_grid(np.ones((k, 3), np.float32))
            assert n.shape == (k, 3)
            np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)

    def test_viewpoint_orientation(self, rng):
        from tpu3dlm.ops.pointcloud import estimate_normals_grid

        pts = np.stack(
            [rng.uniform(-1, 1, 500), rng.uniform(-1, 1, 500), np.full(500, 3.0)],
            axis=1,
        ).astype(np.float32)
        n = estimate_normals_grid(pts, voxel=0.3, viewpoint=np.zeros(3))
        # camera at origin looking at the z=3 plane → normals point back (-z)
        assert (n[:, 2] < 0).all()


class TestPointToPlaneICP:
    def _scene(self, rng, n=6000):
        """Three mutually perpendicular planes + offset patches — the
        man-made interior class (fully constrained for plane residuals)
        where point-to-POINT ICP still slides tangentially along the
        dominant planes."""
        wall = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1, 1, n), np.full(n, 2.0)], axis=1
        )
        floor = np.stack(
            [rng.uniform(-2, 2, n // 2), np.full(n // 2, 1.0),
             rng.uniform(1.0, 2.0, n // 2)], axis=1
        )
        side = np.stack(
            [np.full(n // 2, -2.0), rng.uniform(-1, 1, n // 2),
             rng.uniform(1.0, 2.0, n // 2)], axis=1
        )
        patch = np.stack(
            [rng.uniform(0.8, 1.2, n // 10), rng.uniform(0.1, 0.5, n // 10),
             np.full(n // 10, 1.85)], axis=1
        )
        return np.concatenate([wall, floor, side, patch]).astype(np.float32)

    def test_recovers_transform_on_planar_scene(self, rng):
        from tpu3dlm.ops import geometry as G
        from tpu3dlm.ops.icp import icp_point_to_plane
        from tpu3dlm.ops.pointcloud import estimate_normals_grid

        base = self._scene(rng)
        ang = 0.1
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(
            G.quat_to_rotmat(jnp.array([0, 0, np.sin(ang / 2), np.cos(ang / 2)]))
        )
        T[:3, 3] = [0.25, -0.15, 0.1]
        comp = self._scene(np.random.default_rng(7)) @ T[:3, :3].T + T[:3, 3]
        src = comp[rng.choice(comp.shape[0], 2048, replace=False)]

        normals = estimate_normals_grid(base, voxel=0.15)
        # production recipe (alignment/align.py): centroid init, then
        # coarse-to-fine correspondence radii
        T_run = centroid_align(jnp.asarray(src), jnp.asarray(base))
        for d in (0.6, 0.15):
            res = icp_point_to_plane(
                jnp.asarray(src), jnp.asarray(base), jnp.asarray(normals),
                init_transform=T_run, max_correspondence_dist=d, iterations=25,
            )
            T_run = res.transform
        T_est = np.asarray(T_run)
        err = np.abs(T_est @ T - np.eye(4)).max()
        assert err < 0.05, f"point-to-plane failed to invert the transform: {err}"
        # animation contract: per-iteration increments recorded
        assert np.asarray(res.step_transforms).shape == (25, 4, 4)

    def test_partial_overlap(self, rng):
        """Maintenance scans rarely cover the exact same extent as the gold
        standard — registration must survive ~35% of the comparison scan
        having no counterpart (the correspondence-distance gate rejects the
        non-overlapping tail instead of letting it drag the solve)."""
        from tpu3dlm.ops import geometry as G
        from tpu3dlm.ops.icp import icp_point_to_plane
        from tpu3dlm.ops.pointcloud import estimate_normals_grid

        base = self._scene(rng)
        # base covers only x < 1.0 — the comparison's x > 1.0 region is
        # pure non-overlap
        base = base[base[:, 0] < 1.0]
        ang = 0.08
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(
            G.quat_to_rotmat(jnp.array([0, 0, np.sin(ang / 2), np.cos(ang / 2)]))
        )
        T[:3, 3] = [0.2, -0.1, 0.08]
        comp = self._scene(np.random.default_rng(11)) @ T[:3, :3].T + T[:3, 3]
        src = comp[rng.choice(comp.shape[0], 2048, replace=False)]

        normals = estimate_normals_grid(base, voxel=0.15)
        T_run = centroid_align(jnp.asarray(src), jnp.asarray(base))
        res = None
        for d in (0.6, 0.15):
            res = icp_point_to_plane(
                jnp.asarray(src), jnp.asarray(base), jnp.asarray(normals),
                init_transform=T_run, max_correspondence_dist=d, iterations=25,
            )
            T_run = res.transform
        err = np.abs(np.asarray(T_run) @ T - np.eye(4)).max()
        assert err < 0.06, f"partial-overlap registration failed: {err}"
        # the gate visibly rejected the non-overlapping tail
        assert 0.3 < float(res.inlier_frac) < 0.95


class TestKabsch:
    def test_recovers_known_transform(self, rng):
        from tpu3dlm.ops import geometry as G

        src = rng.normal(size=(50, 3)).astype(np.float32)
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        T = np.asarray(G.pose_to_matrix(jnp.array([0.3, -0.2, 0.5, *q], jnp.float32)))
        dst = src @ T[:3, :3].T + T[:3, 3]
        T_est = np.asarray(kabsch(jnp.array(src), jnp.array(dst), jnp.ones(50)))
        np.testing.assert_allclose(T_est, T, atol=1e-4)

    def test_weights_ignore_outliers(self, rng):
        src = rng.normal(size=(40, 3)).astype(np.float32)
        dst = src + np.array([1.0, 0.0, 0.0], np.float32)
        dst[:5] += 100.0  # gross outliers
        w = np.ones(40, np.float32)
        w[:5] = 0.0
        T = np.asarray(kabsch(jnp.array(src), jnp.array(dst), jnp.array(w)))
        np.testing.assert_allclose(T[:3, 3], [1, 0, 0], atol=1e-4)
        np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-4)


class TestICP:
    def test_recovers_rigid_transform(self, rng):
        from tpu3dlm.ops import geometry as G

        target = rng.uniform(-1, 1, size=(800, 3)).astype(np.float32)
        angle = 0.15
        q = np.array([0, 0, np.sin(angle / 2), np.cos(angle / 2)], np.float32)
        T_true = np.asarray(
            G.pose_to_matrix(jnp.array([0.1, -0.05, 0.08, *q], jnp.float32))
        )
        # source = target moved by inverse → ICP must find T_true
        Ti = np.linalg.inv(T_true)
        source = target @ Ti[:3, :3].T + Ti[:3, 3]
        res = icp(jnp.array(source), jnp.array(target), iterations=30,
                  max_correspondence_dist=1.0)
        np.testing.assert_allclose(np.asarray(res.transform), T_true, atol=5e-3)
        assert float(res.rmse) < 1e-2
        assert float(res.inlier_frac) > 0.99

    def test_step_transforms_compose_to_final(self, rng):
        target = rng.uniform(-1, 1, size=(500, 3)).astype(np.float32)
        source = target + np.array([0.3, 0.1, -0.2], np.float32)
        res = icp(jnp.array(source), jnp.array(target), iterations=10)
        T = np.eye(4)
        for i in range(10):
            T = np.asarray(res.step_transforms)[i] @ T
        np.testing.assert_allclose(T, np.asarray(res.transform), atol=1e-5)

    def test_zero_inliers_report_inf_rmse(self, rng):
        """A registration where NOTHING matches within the radius must not
        report a perfect fit: rmse used to come out 0.0 with all weights
        zero, outranking every honest solve. It must be inf, with
        inlier_frac 0 and an identity (finite) transform."""
        target = rng.uniform(-1, 1, size=(200, 3)).astype(np.float32)
        source = target + np.array([500.0, 0.0, 0.0], np.float32)  # far away
        res = icp(jnp.array(source), jnp.array(target), iterations=3,
                  max_correspondence_dist=0.05)
        assert np.isinf(float(res.rmse))
        assert float(res.inlier_frac) == 0.0
        assert np.isfinite(np.asarray(res.transform)).all()

    def test_final_metrics_describe_returned_transform(self, rng):
        """rmse/inlier_frac must be measured under the RETURNED transform,
        not the previous iterate (the in-loop residual is evaluated before
        the iteration's increment is applied): recompute the residual under
        res.transform independently and demand agreement after a deliberately
        unconverged run."""
        from scipy.spatial import cKDTree

        target = rng.uniform(-1, 1, size=(500, 3)).astype(np.float32)
        source = target + np.array([0.4, 0.0, 0.0], np.float32)
        res = icp(jnp.array(source), jnp.array(target), iterations=1,
                  max_correspondence_dist=0.5)
        T = np.asarray(res.transform)
        moved = source @ T[:3, :3].T + T[:3, 3]
        d, _ = cKDTree(target).query(moved)
        w = d <= 0.5
        want_rmse = np.sqrt(np.mean(d[w] ** 2)) if w.any() else np.inf
        np.testing.assert_allclose(float(res.rmse), want_rmse, rtol=1e-4)
        np.testing.assert_allclose(
            float(res.inlier_frac), w.mean(), atol=1e-6
        )

    def test_centroid_align(self, rng):
        a = rng.normal(size=(100, 3)).astype(np.float32)
        b = a + np.array([5.0, -3.0, 2.0], np.float32)
        T = np.asarray(centroid_align(jnp.array(a), jnp.array(b)))
        np.testing.assert_allclose(T[:3, 3], [5, -3, 2], atol=1e-5)
        np.testing.assert_allclose(T[:3, :3], np.eye(3))


class TestPCAInit:
    def _anisotropic_cloud(self, rng, n=2000):
        # distinct variances along each axis so the PCA frame is unambiguous
        return (rng.normal(size=(n, 3)) * np.array([4.0, 1.5, 0.4])).astype(
            np.float32
        )

    def test_candidates_are_proper_rotations(self, rng):
        from tpu3dlm.ops.icp import pca_init_candidates

        a = self._anisotropic_cloud(rng)
        b = rng.normal(size=(1500, 3)).astype(np.float32) * 2.0
        cands = np.asarray(pca_init_candidates(jnp.array(a), jnp.array(b)))
        assert cands.shape == (4, 4, 4)
        for T in cands:
            R = T[:3, :3]
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
            np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
            np.testing.assert_allclose(T[3], [0, 0, 0, 1], atol=0)

    def test_one_candidate_recovers_large_rotation(self, rng):
        from tpu3dlm.ops import geometry as G
        from tpu3dlm.ops.icp import init_residual, pca_init_candidates

        target = self._anisotropic_cloud(rng)
        angle = 2.8  # ~160° — far outside any ICP basin
        q = np.array([0, 0, np.sin(angle / 2), np.cos(angle / 2)], np.float32)
        T_true = np.asarray(
            G.pose_to_matrix(jnp.array([1.0, -2.0, 0.5, *q], jnp.float32))
        )
        Ti = np.linalg.inv(T_true)
        source = target @ Ti[:3, :3].T + Ti[:3, 3]
        cands = np.asarray(pca_init_candidates(jnp.array(source), jnp.array(target)))
        res = [
            float(init_residual(jnp.array(source), jnp.array(target), jnp.array(T)))
            for T in cands
        ]
        best = cands[int(np.argmin(res))]
        np.testing.assert_allclose(best, T_true, atol=0.05)

    def test_rotation_about_fixes_center(self, rng):
        from tpu3dlm.ops.icp import rotation_about

        R = np.asarray(
            [[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], np.float32
        )
        c = np.array([1.0, 2.0, 3.0], np.float32)
        T = np.asarray(rotation_about(jnp.array(R), jnp.array(c)))
        np.testing.assert_allclose(T[:3, :3] @ c + T[:3, 3], c, atol=1e-6)


class TestAuction:
    def test_matches_scipy_square(self, rng):
        for trial in range(5):
            cost = rng.uniform(0, 10, size=(8, 8)).astype(np.float32)
            assign, matched = auction_assign(jnp.array(cost), unmatch_cost=1e6)
            ri, ci = linear_sum_assignment(cost)
            got = float(cost[np.arange(8), np.asarray(assign)].sum())
            want = float(cost[ri, ci].sum())
            assert matched.all()
            np.testing.assert_allclose(got, want, atol=1e-3)

    def test_rectangular_more_cols(self, rng):
        cost = rng.uniform(0, 10, size=(4, 9)).astype(np.float32)
        assign, matched = auction_assign(jnp.array(cost), unmatch_cost=1e6)
        ri, ci = linear_sum_assignment(cost)
        got = float(cost[np.arange(4), np.asarray(assign)].sum())
        want = float(cost[ri, ci].sum())
        assert matched.all()
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_unmatch_threshold(self):
        # two golds, one close candidate: second gold must go unmatched
        cost = np.array([[0.1, 5.0], [4.0, 5.0]], np.float32)
        assign, matched = auction_assign(jnp.array(cost), unmatch_cost=1.0)
        assert bool(matched[0]) and int(assign[0]) == 0
        assert not bool(matched[1])

    def test_forbidden_pairs(self):
        cost = np.array([[np.inf, 2.0], [1.0, np.inf]], np.float32)
        assign, matched = auction_assign(jnp.array(cost), unmatch_cost=100.0)
        assert int(assign[0]) == 1 and int(assign[1]) == 0

    def test_all_forbidden(self):
        """An entirely-inf cost matrix (e.g. zero label overlap between the
        box sets) must leave every row unmatched. Regression: the empty
        finite-window max/min gave b_lo=+inf, normalizing the slack to -inf
        — BELOW the forbidden sentinel — so rows 'preferred' forbidden
        columns and the caller indexed records with garbage assignments."""
        cost = np.full((3, 5), np.inf, np.float32)
        assign, matched = auction_assign(jnp.array(cost), unmatch_cost=10.0)
        assert not bool(np.asarray(matched).any())
        assert np.asarray(assign).tolist() == [-1, -1, -1]

    def test_max_iters_exhaustion_is_conservative(self, rng):
        """A bound too small to finish the phases must fail CONSERVATIVELY:
        whatever comes back is in-range and column-unique, with incomplete
        rows reading as unmatched (-1) — never fabricated matches. (The
        default bound is now derived from the problem size, so exhaustion
        only happens with an explicit caller-supplied bound.)"""
        cost = rng.uniform(0, 10, size=(8, 8)).astype(np.float32)
        assign, matched = auction_assign(
            jnp.array(cost), unmatch_cost=1e6, max_iters=2
        )
        a, mk = np.asarray(assign), np.asarray(matched)
        assert (a[~mk] == -1).all()
        cols = a[mk]
        assert ((cols >= 0) & (cols < 8)).all()
        assert len(set(cols.tolist())) == len(cols)  # no duplicate columns

    def test_tiny_spread_huge_unmatch(self):
        """With a near-zero cost spread and a huge unmatch cost the
        normalized slack used to underflow past the forbidden sentinel
        (same bug class as all-forbidden): rows must still take their
        finite pair, never a forbidden one."""
        cost = np.array([[1.0, np.inf], [np.inf, 1.0]], np.float32)
        assign, matched = auction_assign(jnp.array(cost), unmatch_cost=1e9)
        assert np.asarray(assign).tolist() == [0, 1]
        assert bool(np.asarray(matched).all())

    def test_match_report_sets(self):
        cost = np.array(
            [[0.1, 9.0, 9.0], [9.0, 0.2, 9.0]], np.float32
        )
        rep = match_report(jnp.array(cost), unmatch_cost=1.0)
        assert np.asarray(rep["matched_rows"]).tolist() == [True, True]
        assert np.asarray(rep["unmatched_cols"]).tolist() == [False, False, True]

    @pytest.mark.slow  # randomized 200-500 auction sweeps
    def test_stress_sweep_matches_scipy(self):
        """Randomized large instances with adversarial cost structure
        (uniform / clustered / near-tie) cross-checked against scipy's
        Hungarian solver, guarding the single-cold-phase ε choice
        (ops/matching.py — ε-scaled since the cold single phase measured a
        103 s price war here). The auction theorem bounds the result at
        N·ε-optimal = 1e-3·spread total-cost slack; near-ties make that
        bound the binding one. Timing bound covers the execution path
        (compile excluded via warmup)."""
        import time

        rng = np.random.default_rng(7)  # instance-stable: own rng, not the
        # session fixture (whose state depends on test order)

        def make(kind, n):
            if kind == "uniform":
                return rng.uniform(0, 10, size=(n, n)).astype(np.float32)
            if kind == "clustered":
                centers = rng.uniform(0, 10, size=8)
                return (
                    centers[rng.integers(0, 8, size=(n, n))]
                    + rng.normal(0, 1e-3, (n, n))
                ).astype(np.float32)
            # near-tie: every pair almost equally good
            return (5.0 + rng.normal(0, 1e-4, (n, n))).astype(np.float32)

        cases = [(k, 200) for k in ("uniform", "clustered", "neartie")]
        cases.append(("neartie", 500))
        for kind, n in cases:
            cost = make(kind, n)
            auction_assign(jnp.array(cost), unmatch_cost=1e6)  # warmup/compile
            t0 = time.perf_counter()
            assign, matched = auction_assign(jnp.array(cost), unmatch_cost=1e6)
            assign = np.asarray(assign)
            dt = time.perf_counter() - t0
            assert np.asarray(matched).all(), f"{kind} {n}: unmatched rows"
            # permutation check: every column used exactly once
            assert len(set(assign.tolist())) == n, f"{kind} {n}: not a permutation"
            ri, ci = linear_sum_assignment(cost)
            got = float(cost[np.arange(n), assign].sum())
            want = float(cost[ri, ci].sum())
            spread = float(cost.max() - cost.min())
            tol = 1e-3 * spread + 1e-3
            assert got - want <= tol, f"{kind} {n}: gap {got - want} > {tol}"
            assert dt < 60.0, f"{kind} {n}: execution took {dt:.1f}s"


class TestHostInitTwins:
    """Host-numpy init helpers must agree with the JAX versions (they exist
    so the serving path never retraces per cloud size — ops/icp)."""

    def test_centroid_align_np_matches_jax(self, rng):
        from tpu3dlm.ops.icp import centroid_align_np

        s = rng.normal(0, 1, (500, 3)).astype(np.float32)
        t = rng.normal(2, 1, (700, 3)).astype(np.float32)
        np.testing.assert_allclose(
            centroid_align_np(s, t),
            np.asarray(centroid_align(jnp.asarray(s), jnp.asarray(t))),
            atol=1e-5,
        )

    def test_pca_candidates_np_matches_jax_as_set(self, rng):
        """eigh column signs are implementation-defined, but the 4-candidate
        proper-rotation SET is invariant — compare as sets."""
        from tpu3dlm.ops.icp import pca_init_candidates, pca_init_candidates_np

        s = rng.normal(0, [3.0, 1.0, 0.3], (2000, 3)).astype(np.float32)
        R = np.asarray(
            [[0.36, 0.48, -0.8], [-0.8, 0.6, 0.0], [0.48, 0.64, 0.6]], np.float32
        )
        t = (s @ R.T + np.asarray([5, -2, 1], np.float32)).astype(np.float32)
        cn = pca_init_candidates_np(s, t)
        cj = np.asarray(pca_init_candidates(jnp.asarray(s), jnp.asarray(t)))
        for c in cn:
            best = min(np.abs(cj - c).max(axis=(1, 2)))
            assert best < 1e-3, f"candidate missing from JAX set (delta {best})"

    def test_pca_candidates_proper_rotations(self, rng):
        from tpu3dlm.ops.icp import pca_init_candidates_np

        s = rng.normal(0, [2.0, 1.0, 0.5], (1000, 3)).astype(np.float32)
        t = rng.normal(0, [1.0, 2.0, 0.4], (1500, 3)).astype(np.float32)
        for T in pca_init_candidates_np(s, t):
            R = T[:3, :3]
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
            assert np.linalg.det(R) > 0.99


class TestTargetBucketPadding:
    """Far-sentinel target padding (ops/icp.pad_target_bucket) must leave
    the ICP solve EXACT — sentinels can never win a correspondence."""

    def test_bucket_sizes(self):
        from tpu3dlm.ops.icp import pad_target_bucket

        for n, expect in [(5, 1024), (1024, 1024), (1025, 2048), (70000, 131072)]:
            pts = np.zeros((n, 3), np.float32)
            out, _ = pad_target_bucket(pts)
            assert out.shape == (expect, 3)

    def test_padded_solve_identical(self, rng):
        from tpu3dlm.ops.icp import pad_target_bucket

        c, s = np.cos(0.2), np.sin(0.2)
        R = np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        tgt = rng.uniform(-2, 2, (900, 3)).astype(np.float32)
        src = (tgt[:512] @ R.T + np.asarray([0.1, -0.05, 0.02])).astype(np.float32)
        r1 = icp(jnp.asarray(src), jnp.asarray(tgt), iterations=10,
                 max_correspondence_dist=0.5)
        padded, _ = pad_target_bucket(tgt)
        r2 = icp(jnp.asarray(src), jnp.asarray(padded), iterations=10,
                 max_correspondence_dist=0.5)
        np.testing.assert_allclose(
            np.asarray(r1.transform), np.asarray(r2.transform), atol=1e-6
        )
        np.testing.assert_allclose(
            float(r1.rmse), float(r2.rmse), atol=1e-6
        )
        np.testing.assert_allclose(
            float(r1.inlier_frac), float(r2.inlier_frac), atol=1e-6
        )

    def test_normals_padded_alongside(self, rng):
        from tpu3dlm.ops.icp import pad_target_bucket

        pts = rng.uniform(0, 1, (700, 3)).astype(np.float32)
        nrm = np.tile(np.asarray([[0, 1, 0]], np.float32), (700, 1))
        p, n = pad_target_bucket(pts, nrm)
        assert p.shape == n.shape == (1024, 3)
        np.testing.assert_array_equal(n[:700], nrm)


class TestFusedCompareUnits:
    """Unit parity for the pieces the round-4 single-dispatch compare moved
    on-device (alignment/align.py::_fused_compare_program)."""

    def _records(self, rng, n, label_of=None):
        recs = []
        for i in range(n):
            c = rng.uniform(-2, 2, (4, 3)).astype(np.float32)
            recs.append(
                {
                    "frame": 0,
                    "corners": c,
                    "damage": 0,
                    "conf": 0.9,
                    "label": int(label_of(i)) if label_of else i % 3,
                }
            )
        return recs

    def test_box_anchor_residuals_match_host(self, rng):
        """The device box-anchor scorer must reproduce the host
        ``Alignment._box_residual`` (its semantic reference) — including
        the all-label fallback when a comparison label is absent on the
        base side."""
        from tpu3dlm.alignment.align import (
            Alignment,
            _box_anchor_residuals,
            _pad_box_arrays,
        )

        base = self._records(rng, 5)
        # label 7 exists only on the comparison side → fallback pool
        comp = self._records(rng, 4, label_of=lambda i: 7 if i == 2 else i % 3)
        align = Alignment(
            np.zeros((1, 7), np.float32), np.zeros((1, 7), np.float32), {}, {}
        )
        align.base_records = base
        align.comparison_records = comp

        Ts = np.stack(
            [np.eye(4, dtype=np.float32)]
            + [np.eye(4, dtype=np.float32) for _ in range(2)]
        )
        Ts[1, :3, 3] = [0.3, -0.2, 0.1]
        Ts[2, :3, :3] = np.asarray(
            [[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32
        )
        want = np.asarray([align._box_residual(Ts[k]) for k in range(3)])
        got = np.asarray(
            _box_anchor_residuals(
                jnp.asarray(Ts), *_pad_box_arrays(base), *_pad_box_arrays(comp)
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_target_moments_cache_identical(self, rng):
        """centroid/PCA inits from cached ``target_moments_np`` must be
        bit-identical to the direct computation (same subsample seed)."""
        from tpu3dlm.ops.icp import (
            centroid_align_np,
            pca_init_candidates_np,
            target_moments_np,
        )

        src = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
        tgt = rng.uniform(-1, 1, (700, 3)).astype(np.float32) + 0.5
        moments = target_moments_np(tgt)
        np.testing.assert_array_equal(
            centroid_align_np(src, tgt),
            centroid_align_np(src, tgt, target_moments=moments),
        )
        np.testing.assert_array_equal(
            pca_init_candidates_np(src, tgt),
            pca_init_candidates_np(src, tgt, target_moments=moments),
        )

    def test_precomputed_match_short_circuits(self, rng, tmp_path, monkeypatch):
        """A valid ``precomputed_match`` must produce the same report rows
        with ZERO auction dispatches; any metadata mismatch falls back to
        the solver."""
        from tpu3dlm.alignment import comparison as cmp_mod
        from tpu3dlm.alignment.comparison import BBoxComparison

        quad = lambda off: [  # noqa: E731
            np.array([i * 0.1 + off, 0, 3], np.float32) for i in range(4)
        ]
        base = {0: [quad(0.0) + [0, 0.9, 1], quad(5.0) + [0, 0.9, 2]]}
        comp = {0: [quad(0.05) + [0, 0.9, 1]]}

        ref_rows = BBoxComparison(
            base, comp, None, csv_output_file=str(tmp_path / "ref.csv")
        ).match_bboxes()

        def boom(*a, **k):
            raise AssertionError("auction must not run on the precomputed path")

        monkeypatch.setattr(cmp_mod, "auction_assign", boom)
        pm = {"assign": np.asarray([0, -1]), "threshold": 0.5, "n": 2, "m": 1}
        rows = BBoxComparison(
            base, comp, None, csv_output_file=str(tmp_path / "pm.csv"),
            precomputed_match=pm,
        ).match_bboxes()
        assert rows == ref_rows

        # threshold mismatch (pm solved at 0.5, this instance wants 0.7) →
        # must fall back to the (boom'd) solver
        with pytest.raises(AssertionError, match="auction must not run"):
            BBoxComparison(
                base, comp, None, csv_output_file=str(tmp_path / "bad.csv"),
                dist_threshold=0.7, precomputed_match=pm,
            ).match_bboxes()
