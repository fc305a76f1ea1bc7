"""Native C++ component tests: DBSCAN core vs numpy fallback, scanpack I/O."""

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
