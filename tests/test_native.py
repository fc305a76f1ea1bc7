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
