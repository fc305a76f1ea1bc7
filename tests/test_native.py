"""Native C++ component tests: DBSCAN core vs numpy fallback, scanpack I/O."""

import os

import numpy as np
import pytest

from tpu3dlm.native import get_lib, native_dbscan, scanpack_read, scanpack_write


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


class TestNativeDBSCAN:
    def test_matches_python_fallback(self, lib, rng):
        from tests.test_clustering import brute_dbscan, _same_partition

        pts = rng.uniform(0, 1, size=(200, 3)).astype(np.float32)
        eps, mp = 0.15, 4
        got = native_dbscan(pts, eps, mp)
        ref, core = brute_dbscan(pts.astype(np.float64), eps, mp)
        assert _same_partition(got[core], ref[core])
        np.testing.assert_array_equal(got < 0, ref < 0)

    def test_blobs(self, lib, rng):
        b1 = rng.normal(0, 0.05, size=(100, 3)).astype(np.float32)
        b2 = (rng.normal(0, 0.05, size=(150, 3)) + 5).astype(np.float32)
        labels = native_dbscan(np.concatenate([b1, b2]), 0.3, 5)
        assert labels[:100].min() == labels[:100].max() >= 0
        assert labels[100:].min() == labels[100:].max() >= 0
        assert labels[0] != labels[-1]

    def test_large_cloud_fast(self, lib, rng):
        import time

        pts = rng.uniform(0, 10, size=(200_000, 3)).astype(np.float32)
        t0 = time.perf_counter()
        labels = native_dbscan(pts, 0.15, 8)
        dt = time.perf_counter() - t0
        assert labels.shape == (200_000,)
        assert dt < 30.0, f"native DBSCAN too slow: {dt:.1f}s"


class TestScanpack:
    def test_roundtrip(self, lib, tmp_path, rng):
        rgb = rng.integers(0, 255, size=(3, 8, 6, 3)).astype(np.uint8)
        depth = rng.uniform(0, 5, size=(3, 10, 7)).astype(np.float32)
        intr = rng.uniform(size=(3, 4)).astype(np.float32)
        rgb_size = rng.uniform(size=(3, 2)).astype(np.float32)
        poses = rng.uniform(size=(3, 7)).astype(np.float32)
        p = str(tmp_path / "scan.pack")
        assert scanpack_write(p, rgb, depth, intr, rgb_size, poses)
        out = scanpack_read(p)
        assert out is not None
        for a, b in zip(out, (rgb, depth, intr, rgb_size, poses)):
            np.testing.assert_array_equal(a, b)

    def test_missing_file(self):
        assert scanpack_read("/nonexistent/scan.pack") is None


class TestScanpackMemmap:
    """Python memmap layer over the pack layout (streaming reader/writer).

    Layout parity with the C++ writer (native/src/scanpack.cpp Header +
    array order) is load-bearing: a pack written whole by `load_scan` must
    memmap-serve the streaming path byte-identically."""

    @staticmethod
    def _arrays(rng, f=3, h=8, w=6, hd=10, wd=7):
        return (
            rng.integers(0, 255, size=(f, h, w, 3)).astype(np.uint8),
            rng.uniform(0, 5, size=(f, hd, wd)).astype(np.float32),
            rng.uniform(size=(f, 4)).astype(np.float32),
            rng.uniform(size=(f, 2)).astype(np.float32),
            rng.uniform(size=(f, 7)).astype(np.float32),
        )

    def test_memmap_matches_c_writer(self, lib, tmp_path, rng):
        from tpu3dlm.native import scanpack_memmap

        arrays = self._arrays(rng)
        p = str(tmp_path / "scan.pack")
        assert scanpack_write(p, *arrays)
        pack = scanpack_memmap(p)
        assert pack is not None and pack["dims"] == (3, 8, 6, 10, 7)
        for name, ref in zip(("rgb", "depth", "intr", "rgb_size", "poses"), arrays):
            np.testing.assert_array_equal(np.array(pack[name]), ref)

    def test_create_finalize_read_back(self, tmp_path, rng):
        """Incremental writer → finalize → both readers see the data."""
        from tpu3dlm.native import scanpack_create, scanpack_finalize, scanpack_memmap

        arrays = self._arrays(rng)
        p = str(tmp_path / "scan.pack")
        w = scanpack_create(p, 3, 8, 6, 10, 7)
        for name, ref in zip(("rgb", "depth", "intr", "rgb_size", "poses"), arrays):
            w[name][:2] = ref[:2]  # chunk 1
            w[name][2:] = ref[2:]  # chunk 2
            w[name].flush()
        assert scanpack_memmap(p) is None  # not finalized yet
        scanpack_finalize(p)
        pack = scanpack_memmap(p)
        for name, ref in zip(("rgb", "depth", "intr", "rgb_size", "poses"), arrays):
            np.testing.assert_array_equal(np.array(pack[name]), ref)
        if get_lib() is not None:  # C reader agrees on the same bytes
            out = scanpack_read(p)
            assert out is not None
            for a, ref in zip(out, arrays):
                np.testing.assert_array_equal(a, ref)

    def test_truncated_pack_rejected(self, tmp_path, rng):
        from tpu3dlm.native import scanpack_create, scanpack_finalize, scanpack_memmap

        p = str(tmp_path / "scan.pack")
        scanpack_create(p, 3, 8, 6, 10, 7)
        scanpack_finalize(p)
        with open(p, "r+b") as fp:
            fp.truncate(os.path.getsize(p) - 16)
        assert scanpack_memmap(p) is None

    def test_corrupt_dims_rejected(self, tmp_path, rng):
        """Garbage dims behind a valid magic must read as 'invalid pack'
        (None → callers rebuild), not crash np.memmap / the caller's
        allocations: a negative total even defeats the truncation check."""
        from tpu3dlm.native import scanpack_create, scanpack_finalize, scanpack_memmap

        p = str(tmp_path / "scan.pack")
        scanpack_create(p, 3, 8, 6, 10, 7)
        scanpack_finalize(p)
        for bad in ([-3, 8, 6, 10, 7], [3, 8, 0, 10, 7], [3, 8, 6, 10, 2**40]):
            with open(p, "r+b") as fp:
                fp.seek(8)
                fp.write(np.asarray(bad, np.int64).tobytes())
            assert scanpack_memmap(p) is None
            assert scanpack_read(p) is None
        # restore good dims: the pack reads again (corruption was the only
        # thing rejecting it)
        with open(p, "r+b") as fp:
            fp.seek(8)
            fp.write(np.asarray([3, 8, 6, 10, 7], np.int64).tobytes())
        assert scanpack_memmap(p) is not None


class TestNativeNormals:
    def test_plane_normals_match_numpy_semantics(self, lib, rng):
        from tpu3dlm.native import native_grid_normals

        pts = np.stack(
            [rng.uniform(-1, 1, 5000), rng.uniform(-1, 1, 5000),
             0.01 * rng.normal(size=5000)], axis=1,
        ).astype(np.float32)
        n = native_grid_normals(pts, 0.25)
        assert n is not None
        np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-4)
        assert (np.abs(n[:, 2]) > 0.99).all()

    def test_rayleigh_quotient_optimality(self, lib, rng):
        """For every cell, the native normal's n^T C n must be within tol of
        numpy's smallest eigenvalue — eigensolver correctness without
        depending on eigenvector sign/degeneracy conventions."""
        from tpu3dlm.native import native_grid_normals

        pts = rng.normal(size=(4000, 3)).astype(np.float32) * [1.0, 0.7, 0.2]
        voxel = 0.5
        n = native_grid_normals(pts, voxel)
        cells = np.floor(pts / voxel).astype(np.int64)
        cells -= cells.min(axis=0)
        dims = cells.max(axis=0) + 1
        key = (cells[:, 0] * dims[1] + cells[:, 1]) * dims[2] + cells[:, 2]
        for k in np.unique(key):
            m = key == k
            if m.sum() < 8:
                continue
            c = np.cov(pts[m].T.astype(np.float64))
            lmin = np.linalg.eigvalsh(c)[0]
            # native covariance divides by n (not n-1); compare quotients on
            # the same matrix
            c_biased = c * (m.sum() - 1) / m.sum()
            lmin_b = np.linalg.eigvalsh(c_biased)[0]
            nv = n[m][0].astype(np.float64)
            q = nv @ c_biased @ nv
            assert q <= lmin_b + 1e-6 + 0.05 * abs(lmin_b), (q, lmin_b)

    def test_viewpoint_orientation(self, lib, rng):
        from tpu3dlm.native import native_grid_normals

        pts = np.stack(
            [rng.uniform(-1, 1, 1000), rng.uniform(-1, 1, 1000),
             np.full(1000, 3.0)], axis=1,
        ).astype(np.float32)
        n = native_grid_normals(pts, 0.3, viewpoint=np.zeros(3))
        assert (n[:, 2] < 0).all()

    def test_matches_python_fallback_on_planes(self, lib, rng):
        """Native and numpy paths agree (up to sign) on well-conditioned
        plane cells."""
        from tpu3dlm.native import native_grid_normals
        from tpu3dlm.ops import pointcloud as pc

        pts = np.stack(
            [rng.uniform(-2, 2, 8000), np.full(8000, 1.0),
             rng.uniform(0, 2, 8000)], axis=1,
        ).astype(np.float32)
        got = native_grid_normals(pts, 0.25)
        # force the numpy path
        import unittest.mock as mock

        with mock.patch("tpu3dlm.native.native_grid_normals", return_value=None):
            want = pc.estimate_normals_grid(pts, voxel=0.25)
        agree = np.abs(np.einsum("ij,ij->i", got, want))
        assert (agree > 0.999).mean() > 0.999


class TestNativeMarchAndSplat:
    """C++ Poisson host legs (native/src/poisson.cpp) vs the numpy oracles
    in mapper/meshing.py — same decomposition/case-table/winding/weld; the
    vertex ORDER may differ, the triangle SET may not (VERDICT r2 item 7)."""

    def _sphere_field(self, n=20, r=6.5):
        g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
        return r - np.sqrt(((g - n / 2) ** 2).sum(axis=0))

    def test_march_matches_numpy_triangle_set(self, lib):
        from tpu3dlm.mapper.meshing import (
            _marching_tetrahedra_np, marching_tetrahedra,
        )

        field = self._sphere_field()
        origin = np.array([0.3, -1.2, 2.0], np.float32)
        for toward in (True, False):
            v1, f1 = _marching_tetrahedra_np(
                field, 0.0, origin, 0.05, normals_toward_positive=toward
            )
            v2, f2 = marching_tetrahedra(
                field, 0.0, origin, 0.05, normals_toward_positive=toward
            )
            assert v1.shape == v2.shape and f1.shape == f2.shape

            def canon(v, f):
                # order-independent triangle keys: each face's 3 vertices
                # sorted, rounded well above the weld quantum
                t = np.sort(np.round(v[f], 3), axis=1)
                return set(map(tuple, t.reshape(len(f), 9).tolist()))

            assert canon(v1, f1) == canon(v2, f2)
            # winding parity: total signed volume agrees (orientation is
            # part of the contract, not just the vertex positions)
            def signed_vol(v, f):
                t = v[f]
                return float(np.einsum(
                    "ij,ij->", np.cross(t[:, 0], t[:, 1]), t[:, 2]
                ) / 6.0)

            np.testing.assert_allclose(
                signed_vol(v1, f1), signed_vol(v2, f2), rtol=1e-4
            )

    def test_march_nan_corners_skipped(self, lib):
        from tpu3dlm.mapper.meshing import marching_tetrahedra

        field = self._sphere_field()
        field[10:, :, :] = np.nan  # unobserved half
        v, f = marching_tetrahedra(field, 0.0, np.zeros(3), 0.1)
        assert len(f) > 0
        assert np.isfinite(v).all()
        assert v[:, 0].max() <= 10 * 0.1 + 1e-6  # nothing meshed in the NaN half

    def test_march_unwelded(self, lib):
        from tpu3dlm.mapper.meshing import (
            _marching_tetrahedra_np, marching_tetrahedra,
        )

        field = self._sphere_field(12, r=4.0)
        v1, f1 = _marching_tetrahedra_np(field, 0.0, np.zeros(3), 0.1, weld=False)
        v2, f2 = marching_tetrahedra(field, 0.0, np.zeros(3), 0.1, weld=False)
        assert v1.shape == v2.shape and f1.shape == f2.shape

    def test_splat_bit_exact_vs_numpy(self, lib, rng):
        from tpu3dlm.mapper.meshing import trilinear_scatter
        from tpu3dlm.native import native_trilinear_splat

        pts = rng.uniform(-0.4, 2.3, (20_000, 3)).astype(np.float32)
        vals = rng.normal(size=(20_000, 3)).astype(np.float32)
        lo = np.array([-0.5, -0.5, -0.5], np.float32)
        dims = (25, 30, 28)
        got = native_trilinear_splat(pts, vals, lo, dims, 0.1)
        # numpy fallback path (native disabled by empty check bypass):
        from tpu3dlm.mapper import meshing as M

        import tpu3dlm.native as N
        orig = N.native_trilinear_splat
        try:
            N.native_trilinear_splat = lambda *a, **k: None
            want = trilinear_scatter(pts, vals, lo, dims, 0.1)
        finally:
            N.native_trilinear_splat = orig
        np.testing.assert_array_equal(got, want)
        # scalar (unit-mass) mode conserves mass; border clamp keeps
        # out-of-grid points
        got_s = native_trilinear_splat(pts, None, lo, dims, 0.1)
        np.testing.assert_allclose(got_s.sum(), len(pts), rtol=1e-9)

    def test_cull_mask_matches_numpy(self, lib, rng):
        from tpu3dlm.mapper.poisson import _cull_leakage
        from tpu3dlm.native import native_cull_keep_mask

        # a plane of points + a mesh with one far-away leakage triangle
        pts = np.stack(
            [rng.uniform(0, 2, 4000), rng.uniform(0, 2, 4000),
             rng.normal(0, 0.002, 4000)], axis=1
        ).astype(np.float32)
        from tpu3dlm.mapper.meshing import marching_tetrahedra
        from tpu3dlm.mapper.poisson import poisson_indicator

        chi, origin, voxel, iso = poisson_indicator(pts, voxel=0.08)
        verts, faces = marching_tetrahedra(
            chi, iso, origin, voxel, normals_toward_positive=False
        )
        v1, f1 = _cull_leakage(verts, faces, pts, origin, cell=2 * voxel)
        # numpy fallback for the keep mask
        import tpu3dlm.native as N

        orig = N.native_cull_keep_mask
        try:
            N.native_cull_keep_mask = lambda *a, **k: None
            v2, f2 = _cull_leakage(verts, faces, pts, origin, cell=2 * voxel)
        finally:
            N.native_cull_keep_mask = orig
        assert f1.shape == f2.shape
        np.testing.assert_array_equal(v1, v2)
        np.testing.assert_array_equal(f1, f2)
        assert len(f1) < len(faces)  # some leakage was actually culled
