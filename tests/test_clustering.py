"""Grid-DBSCAN tests against a brute-force reference implementation."""

import numpy as np
import pytest

from tpu3dlm.mapper.clustering import dbscan, largest_cluster


def brute_dbscan(pts, eps, min_pts):
    """Textbook O(N²) DBSCAN for cross-checking."""
    n = len(pts)
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    neigh = d2 <= eps * eps
    counts = neigh.sum(1)
    core = counts >= min_pts
    labels = np.full(n, -1)
    cid = 0
    for i in range(n):
        if labels[i] != -1 or not core[i]:
            continue
        stack = [i]
        labels[i] = cid
        while stack:
            j = stack.pop()
            if core[j]:
                for k in np.nonzero(neigh[j])[0]:
                    if labels[k] == -1:
                        labels[k] = cid
                        if core[k]:
                            stack.append(k)
        cid += 1
    return labels, core


def _same_partition(a, b):
    """Cluster labels equal up to renaming (noise must coincide exactly)."""
    assert ((a < 0) == (b < 0)).all()
    mapping = {}
    for x, y in zip(a, b):
        if x < 0:
            continue
        if x in mapping:
            if mapping[x] != y:
                return False
        else:
            mapping[x] = y
    return len(set(mapping.values())) == len(mapping)


class TestDBSCAN:
    def test_two_blobs_and_noise(self, rng):
        blob1 = rng.normal(0, 0.05, size=(60, 3))
        blob2 = rng.normal(0, 0.05, size=(80, 3)) + np.array([5, 5, 5])
        noise = rng.uniform(-10, 10, size=(5, 3)) + np.array([20, 0, 0])
        pts = np.concatenate([blob1, blob2, noise])
        labels = dbscan(pts, eps=0.3, min_points=5)
        assert labels[:60].min() == labels[:60].max() >= 0
        assert labels[60:140].min() == labels[60:140].max() >= 0
        assert labels[:60].max() != labels[60:140].max()

    def test_matches_bruteforce_core_partition(self, rng):
        pts = rng.uniform(0, 1, size=(150, 3))
        eps, mp = 0.15, 4
        ours = dbscan(pts, eps, mp)
        ref, core = brute_dbscan(pts, eps, mp)
        # core points must agree exactly on the partition; border points may
        # legally attach to different adjacent clusters (DBSCAN ambiguity)
        assert _same_partition(ours[core], ref[core])
        # noise agrees everywhere
        np.testing.assert_array_equal(ours < 0, ref < 0)

    def test_empty(self):
        assert dbscan(np.zeros((0, 3)), 0.1, 3).shape == (0,)

    def test_largest_cluster(self, rng):
        small = rng.normal(0, 0.02, size=(20, 3))
        big = rng.normal(0, 0.02, size=(200, 3)) + 3.0
        pts = np.concatenate([small, big])
        idx = largest_cluster(pts, eps=0.2, min_points=5)
        assert (idx >= 20).all() and len(idx) == 200
