"""Matmul-precision regression tests.

On TPU (and this environment's CPU backend) an f32 matmul defaults to ONE
bf16 MXU pass — at scan scale (metres, coords ~10) that silently injected
centimetre-level noise into every transformed point and flipped ~half of
all nearest-neighbour picks (measured 45% correct at 4k targets on v5e
before the fix). Geometry matmuls now pin precision=HIGHEST
(ops/geometry.PRECISE); these tests fail loudly if any pinned site
regresses to default precision. They are meaningful on ANY backend that
lowers default-precision f32 matmuls to bf16 — and harmless (trivially
green) elsewhere.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

SCALE = 10.0  # metres — scan-sized coordinates, where bf16 noise is ~cm


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def _random_rigid(rng):
    from tpu3dlm.ops.geometry import so3_exp

    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.asarray(so3_exp(jnp.asarray(rng.normal(size=3).astype(np.float32))))
    T[:3, 3] = rng.uniform(-2, 2, 3)
    return T


class TestGeometry:
    def test_transform_points_f32_exact(self, rng):
        from tpu3dlm.ops.geometry import transform_points

        pts = rng.uniform(0, SCALE, (4096, 3)).astype(np.float32)
        T = _random_rigid(rng)
        got = np.asarray(jax.jit(transform_points)(jnp.asarray(T), jnp.asarray(pts)))
        want = pts.astype(np.float64) @ T[:3, :3].astype(np.float64).T + T[:3, 3]
        # f32 round-off is ~1e-6·scale; one bf16 pass would be ~3e-2
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_invert_se3_roundtrip_tight(self, rng):
        from tpu3dlm.ops.geometry import invert_se3

        T = jnp.asarray(_random_rigid(rng))
        eye = np.asarray(jax.jit(lambda t: invert_se3(invert_se3(t)))(T))
        np.testing.assert_allclose(eye, np.asarray(T), atol=1e-5)


class TestLimbSplit:
    """The pallas NN kernel's exactness rests on the bf16 limb split
    (ops/pallas/pairwise._split3_bf16). Two invariants, each of which has
    silently failed once:

    * limbs must be produced by mantissa-mask truncation — the plain
      ``astype(bf16).astype(f32)`` round-trip is FOLDED AWAY under
      ``--xla_allow_excess_precision=true`` (this environment's compile
      flag), leaving zero residual limbs and bf16-quality picks;
    * the three limbs must reconstruct the f32 value to ~2⁻²⁴ relative.
    """

    def test_limbs_reconstruct_and_survive_jit(self, rng):
        from tpu3dlm.ops.pallas.pairwise import _split3_bf16

        x = (rng.uniform(-10, 10, (4096,)).astype(np.float32)
             + rng.normal(0, 1e-3, 4096).astype(np.float32))
        h0, h1, h2 = jax.jit(_split3_bf16)(jnp.asarray(x))
        h0, h1, h2 = (np.asarray(h, np.float64) for h in (h0, h1, h2))
        recon = h0 + h1 + h2
        np.testing.assert_allclose(recon, x.astype(np.float64),
                                   rtol=2.0 ** -22, atol=1e-12)
        # a folded-away round-trip leaves h1/h2 all-zero for generic values
        assert np.count_nonzero(h1) > 3500
        assert np.count_nonzero(h2) > 3000

    def test_limb_kernel_across_coordinate_scales(self, rng):
        """The limb-decomposed NN kernel must stay f32-accurate whether a
        cloud is in millimetres, metres, or kilometre-scale units —
        interpret-mode check across 6 decades (CPU suite; the TPU path
        compiles the identical kernel)."""
        if jax.default_backend() != "cpu":
            pytest.skip("interpret-mode check is a CPU-suite test")
        from jax.experimental.pallas import tpu as pltpu

        from tpu3dlm.ops.pallas.pairwise import nearest_neighbors_pallas

        for scale in (1e-3, 1.0, 1e3):
            tgt = (rng.uniform(0, 1, (1024, 3)) * scale).astype(np.float32)
            q = (rng.uniform(0, 1, (128, 3)) * scale).astype(np.float32)
            d2 = ((q[:, None, :].astype(np.float64)
                   - tgt[None, :, :].astype(np.float64)) ** 2).sum(-1)
            with pltpu.force_tpu_interpret_mode():
                pi, pd2 = nearest_neighbors_pallas(
                    jnp.asarray(q), jnp.asarray(tgt), tile_n=128, tile_m=512)
            assert (np.asarray(pi) == d2.argmin(1)).mean() >= 0.98, scale
            np.testing.assert_allclose(
                np.asarray(pd2), d2.min(1), atol=1e-3 * scale * scale,
                err_msg=f"scale={scale}")

    def test_top_limb_is_exact_bf16(self, rng):
        from tpu3dlm.ops.pallas.pairwise import _trunc_top_limb

        x = rng.uniform(-10, 10, (1024,)).astype(np.float32)
        h0 = np.asarray(jax.jit(_trunc_top_limb)(jnp.asarray(x)))
        # low 16 mantissa bits zero → exactly representable in bf16
        assert (h0.view(np.uint32) & 0xFFFF).max() == 0
        # truncation error bounded by one bf16 ulp (7 explicit mantissa bits)
        err = np.abs(x - h0)
        assert (err <= np.maximum(np.abs(x), 1e-30) * 2.0 ** -7).all()


class TestNearestNeighbour:
    def _clouds(self, rng, m=4096, n=512):
        tgt = rng.uniform(0, SCALE, (m, 3)).astype(np.float32)
        q = rng.uniform(0, SCALE, (n, 3)).astype(np.float32)
        d2 = ((q[:, None, :].astype(np.float64)
               - tgt[None, :, :].astype(np.float64)) ** 2).sum(-1)
        return tgt, q, d2.argmin(1), d2.min(1)

    def test_xla_fallback_matches_f64_bruteforce(self, rng):
        from tpu3dlm.ops.pallas.pairwise import nearest_neighbors_xla

        tgt, q, bi, bd2 = self._clouds(rng)
        xi, xd2 = nearest_neighbors_xla(jnp.asarray(q), jnp.asarray(tgt))
        # ≥99% identical picks (the rest are genuine f32-level near-ties)…
        assert (np.asarray(xi) == bi).mean() >= 0.99
        # …and EVERY distance f32-accurate (bf16 regression = ~0.3 abs err)
        np.testing.assert_allclose(np.asarray(xd2), bd2, atol=1e-3)

    def test_pallas_interpret_matches_f64_bruteforce(self, rng):
        if jax.default_backend() != "cpu":
            pytest.skip("interpret-mode check is a CPU-suite test")
        from jax.experimental.pallas import tpu as pltpu

        from tpu3dlm.ops.pallas.pairwise import nearest_neighbors_pallas

        tgt, q, bi, bd2 = self._clouds(rng, m=2048, n=256)
        with pltpu.force_tpu_interpret_mode():
            pi, pd2 = nearest_neighbors_pallas(
                jnp.asarray(q), jnp.asarray(tgt), tile_n=128, tile_m=512)
        assert (np.asarray(pi) == bi).mean() >= 0.99
        np.testing.assert_allclose(np.asarray(pd2), bd2, atol=1e-3)

    def test_anchored_matches_f64_bruteforce(self, rng):
        from tpu3dlm.ops.ann import build_anchor_index, default_index_shape, nn_anchored

        tgt, q, bi, bd2 = self._clouds(rng)
        c, b = default_index_shape(tgt.shape[0])
        index = build_anchor_index(jnp.asarray(tgt), n_anchors=c, bucket_cap=b)
        ai, ad2 = nn_anchored(jnp.asarray(q), index, top_p=4)
        exact = np.isclose(np.asarray(ad2), bd2, rtol=1e-4, atol=1e-5)
        assert exact.mean() >= 0.995


class TestSolvers:
    def test_kabsch_recovers_exactly(self, rng):
        from tpu3dlm.ops.icp import kabsch

        src = rng.uniform(0, SCALE, (2048, 3)).astype(np.float32)
        T = _random_rigid(rng)
        dst = src @ T[:3, :3].T + T[:3, 3]
        got = np.asarray(kabsch(jnp.asarray(src), jnp.asarray(dst),
                                jnp.ones(2048, np.float32)))
        # noiseless correspondences: the solve is exact up to f32 SVD
        np.testing.assert_allclose(got, T, atol=1e-4)

    def test_median_depth_keeps_millimetres(self, rng):
        """Depth values at metre scale must come through the one-hot
        selection matmuls unrounded (bf16 would quantise to ~8-16 mm)."""
        from tpu3dlm.ops.geometry import bbox_sampled_median_depth

        depth = np.full((128, 128), 5.123456, np.float32)
        med, ok = bbox_sampled_median_depth(
            jnp.asarray(depth), jnp.asarray([10.0, 10.0, 90.0, 90.0]))
        assert bool(ok)
        assert abs(float(med) - 5.123456) < 1e-5
