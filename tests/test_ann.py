"""Anchor-bucketed NN (ops/ann.py): recall, exactness-within-contract,
overflow behavior, static-shape reuse, and ICP end-to-end equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu3dlm.ops.ann import (
    AnchorIndex,
    build_anchor_index,
    default_index_shape,
    nn_anchored,
)
from tpu3dlm.ops.pallas.pairwise import nearest_neighbors_xla


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _scan_like_cloud(rng, n):
    """Wall + floor + clutter — the bench scene's geometry class."""
    n_wall = n // 2
    n_floor = n // 3
    n_clut = n - n_wall - n_floor
    wall = np.stack(
        [rng.uniform(0, 8, n_wall), np.full(n_wall, 0.0) + rng.normal(0, 0.01, n_wall),
         rng.uniform(0, 3, n_wall)], -1)
    floor = np.stack(
        [rng.uniform(0, 8, n_floor), rng.uniform(0, 5, n_floor),
         rng.normal(0, 0.01, n_floor)], -1)
    clut = rng.uniform([0, 0, 0], [8, 5, 3], (n_clut, 3))
    return np.concatenate([wall, floor, clut]).astype(np.float32)


class TestBuild:
    def test_every_bucket_point_belongs_to_its_anchor(self, rng):
        tgt = jnp.asarray(_scan_like_cloud(rng, 4096))
        idx = build_anchor_index(tgt, n_anchors=32, bucket_cap=512)
        # non-sentinel slots must hold the original target coordinates
        buckets = np.asarray(idx.buckets)
        ids = np.asarray(idx.bucket_ids)
        tgt_np = np.asarray(tgt)
        real = buckets[..., 0] < 1e7
        assert real.any()
        np.testing.assert_array_equal(buckets[real], tgt_np[ids[real]])

    def test_ids_in_range(self, rng):
        tgt = jnp.asarray(_scan_like_cloud(rng, 2048))
        idx = build_anchor_index(tgt, n_anchors=64, bucket_cap=64)
        ids = np.asarray(idx.bucket_ids)
        assert ids.min() >= 0 and ids.max() < 2048

    def test_anchor_count_validation(self, rng):
        tgt = jnp.asarray(_scan_like_cloud(rng, 128))
        with pytest.raises(ValueError):
            build_anchor_index(tgt, n_anchors=256, bucket_cap=16)

    def test_default_shape_sane(self):
        c, b = default_index_shape(1 << 20)
        assert c == 8192 and b == 512
        c, b = default_index_shape(1024)
        assert c >= 64 and b >= 32 and c <= 1024


@pytest.mark.slow  # large-cloud ANN recall sweeps
class TestQueryRecall:
    def test_recall_on_scan_geometry(self, rng):
        tgt = jnp.asarray(_scan_like_cloud(rng, 65536))
        c, b = default_index_shape(65536)
        idx = build_anchor_index(tgt, n_anchors=c, bucket_cap=b)
        q = jnp.asarray(_scan_like_cloud(np.random.default_rng(11), 2048)
                        + rng.normal(0, 0.05, (2048, 3)).astype(np.float32))
        ai, ad2 = nn_anchored(q, idx, top_p=4)
        xi, xd2 = nearest_neighbors_xla(q, tgt)
        ai, ad2 = np.asarray(ai), np.asarray(ad2)
        xi, xd2 = np.asarray(xi), np.asarray(xd2)
        # same pick, or same distance (ties / f32 formula differences: the
        # exact kernel computes a²−2ab+b², the anchored path (a−b)² — they
        # round differently at the ~1e-5 level)
        exact = (ai == xi) | np.isclose(ad2, xd2, rtol=1e-3, atol=1e-4)
        assert exact.mean() >= 0.995, f"recall {exact.mean():.4f}"
        # the misses must still be near-neighbours, never garbage
        assert np.all(ad2[~exact] <= xd2[~exact] * 4.0 + 1e-3)

    def test_exact_when_candidates_cover(self, rng):
        """With every point in one anchor's bucket the result is exact."""
        tgt_np = _scan_like_cloud(rng, 256)
        tgt = jnp.asarray(tgt_np)
        idx = build_anchor_index(tgt, n_anchors=1, bucket_cap=256)
        q = jnp.asarray(rng.uniform(0, 8, (128, 3)).astype(np.float32))
        ai, ad2 = nn_anchored(q, idx, top_p=1)
        xi, xd2 = nearest_neighbors_xla(q, tgt)
        np.testing.assert_allclose(np.asarray(ad2), np.asarray(xd2),
                                   rtol=1e-4, atol=1e-5)

    def test_query_padding_roundtrip(self, rng):
        """N not divisible by the chunk size pads internally and trims."""
        tgt = jnp.asarray(_scan_like_cloud(rng, 4096))
        c, b = default_index_shape(4096)
        idx = build_anchor_index(tgt, n_anchors=c, bucket_cap=b)
        q = jnp.asarray(_scan_like_cloud(rng, 4099)[:4099])
        ai, ad2 = nn_anchored(q, idx, top_p=4)
        assert ai.shape == (4099,) and ad2.shape == (4099,)

    def test_overflow_drops_stay_valid(self, rng):
        """A dense cluster overflowing bucket_cap still yields in-range
        indices and near-NN distances (dropped points act like decimation)."""
        dense = rng.normal(0, 0.01, (2000, 3)).astype(np.float32)
        sparse = rng.uniform(5, 10, (48, 3)).astype(np.float32)
        tgt = jnp.asarray(np.concatenate([dense, sparse]))
        idx = build_anchor_index(tgt, n_anchors=8, bucket_cap=32)
        q = jnp.asarray(rng.normal(0, 0.01, (64, 3)).astype(np.float32))
        ai, ad2 = nn_anchored(q, idx, top_p=2)
        ai, ad2 = np.asarray(ai), np.asarray(ad2)
        assert ai.min() >= 0 and ai.max() < 2048
        # queries sit inside the dense cluster: surviving bucket points are
        # a decimated sample of it, so distances stay cluster-scale
        assert np.all(ad2 < 0.1)

    def test_sentinel_padded_target(self, rng):
        """pad_target_bucket sentinels never win a correspondence."""
        from tpu3dlm.ops.icp import pad_target_bucket

        tgt_np = _scan_like_cloud(rng, 700)
        padded, _ = pad_target_bucket(tgt_np)  # → 1024 with 1e6 sentinels
        tgt = jnp.asarray(padded)
        c, b = default_index_shape(padded.shape[0])
        idx = build_anchor_index(tgt, n_anchors=c, bucket_cap=b)
        q = jnp.asarray(tgt_np[:256])
        ai, ad2 = nn_anchored(q, idx, top_p=4)
        assert np.asarray(ai).max() < 700
        assert np.all(np.asarray(ad2) < 1.0)


class TestStaticShapes:
    def test_one_compile_per_bucket_shape(self, rng):
        """Two different raw sizes padding to the same bucket reuse both the
        build and the query programs (serving contract)."""
        from tpu3dlm.ops.icp import pad_target_bucket

        compiled = []
        for n_raw in (700, 900):
            padded, _ = pad_target_bucket(_scan_like_cloud(rng, n_raw))
            c, b = default_index_shape(padded.shape[0])
            idx = build_anchor_index(jnp.asarray(padded), n_anchors=c, bucket_cap=b)
            q = jnp.asarray(_scan_like_cloud(rng, 512))
            nn_anchored(q, idx, top_p=4)
            compiled.append((padded.shape, c, b))
        assert compiled[0] == compiled[1]
        # program identity: the jit caches key on shapes — equal shapes is
        # the property the serving path relies on (utils/shapes)


@pytest.mark.slow  # full ICP runs through the ANN index
class TestICPEquivalence:
    @staticmethod
    def _rigid(omega, t):
        from tpu3dlm.ops.geometry import so3_exp

        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(so3_exp(jnp.asarray(omega, jnp.float32)))
        T[:3, 3] = t
        return T

    def test_icp_anchored_matches_exact(self, rng):
        """Full ICP with anchored iterations converges to (numerically) the
        same transform as the exact path on the bench scene class."""
        from tpu3dlm.ops.icp import icp

        tgt_np = _scan_like_cloud(rng, 16384)
        T_true = self._rigid([0.0, 0.0, 0.06], [0.12, -0.08, 0.04])
        src_np = (tgt_np - T_true[:3, 3]) @ T_true[:3, :3]
        # stride-sample the query across wall/floor/clutter: a contiguous
        # slice would be wall-only, and a planar query slides freely under
        # point-to-point ICP (see alignment/align.py's hybrid-solver note)
        src = jnp.asarray(src_np[::4])
        tgt = jnp.asarray(tgt_np)

        c, b = default_index_shape(tgt_np.shape[0])
        index = build_anchor_index(tgt, n_anchors=c, bucket_cap=b)

        r_exact = icp(src, tgt, max_correspondence_dist=0.5, iterations=25)
        r_anchor = icp(src, tgt, max_correspondence_dist=0.5, iterations=25,
                       target_index=index)
        Te = np.asarray(r_exact.transform)
        Ta = np.asarray(r_anchor.transform)
        np.testing.assert_allclose(Ta, Te, atol=5e-3)
        np.testing.assert_allclose(Ta, T_true, atol=2e-2)
        # measurement pass is exact in both cases
        assert float(r_anchor.rmse) < 0.05

    def test_icp_point_to_plane_anchored(self, rng):
        from tpu3dlm.ops.icp import icp_point_to_plane
        from tpu3dlm.ops.pointcloud import estimate_normals_grid

        tgt_np = _scan_like_cloud(rng, 16384)
        T_true = self._rigid([0.0, 0.0, 0.05], [0.1, -0.05, 0.02])
        src_np = (tgt_np - T_true[:3, 3]) @ T_true[:3, :3]
        nrm = estimate_normals_grid(tgt_np)
        c, b = default_index_shape(tgt_np.shape[0])
        index = build_anchor_index(jnp.asarray(tgt_np), n_anchors=c, bucket_cap=b)

        r = icp_point_to_plane(
            jnp.asarray(src_np[::4]), jnp.asarray(tgt_np), jnp.asarray(nrm),
            max_correspondence_dist=0.5, iterations=25, target_index=index,
        )
        np.testing.assert_allclose(np.asarray(r.transform), T_true, atol=2e-2)
