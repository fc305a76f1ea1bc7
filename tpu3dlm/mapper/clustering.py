"""Grid-hash DBSCAN for point-cloud preprocessing.

Replaces Open3D's ``cluster_dbscan`` (reference src/mapper/mapping.py:99-119,
used with eps/min_points to keep only the largest cluster of the scan cloud).
Algorithm: hash points into eps-sized voxels; a point's neighbourhood is the
27 adjacent voxels, so the classic O(N²) scan becomes O(N·k). Core points
(≥ min_points neighbours within eps) are unioned into clusters; border
points attach to a neighbouring core; noise gets label -1 — Open3D/sklearn
DBSCAN semantics.

Irregular, pointer-chasing union-find stays on the host (SURVEY.md §7 calls
the host fallback acceptable); the O(N·k) distance evaluations are numpy-
vectorised per voxel-pair batch.
"""

from __future__ import annotations

import numpy as np


class _UnionFind:
    def __init__(self, n: int):
        self.parent = np.arange(n)

    def find(self, i: int) -> int:
        p = self.parent
        while p[i] != i:
            p[i] = p[p[i]]
            i = p[i]
        return i

    def union(self, a: int, b: int):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def dbscan(points: np.ndarray, eps: float, min_points: int) -> np.ndarray:
    """(N, 3) → (N,) int32 cluster labels (-1 = noise).

    Prefers the native C++ core (tpu3dlm/native) — required for 1M-point
    clouds; this numpy implementation is the toolchain-free fallback."""
    from tpu3dlm.native import native_dbscan

    native = native_dbscan(points, eps, min_points)
    if native is not None:
        return native

    pts = np.asarray(points, np.float64)
    n = pts.shape[0]
    if n == 0:
        return np.zeros(0, np.int32)

    cells = np.floor(pts / eps).astype(np.int64)
    # hash voxel coords → bucket of point indices
    order = np.lexsort((cells[:, 2], cells[:, 1], cells[:, 0]))
    cells_sorted = cells[order]
    uniq, starts = np.unique(cells_sorted, axis=0, return_index=True)
    bucket_of = {tuple(c): i for i, c in enumerate(uniq)}
    ends = np.append(starts[1:], n)
    members = [order[s:e] for s, e in zip(starts, ends)]

    offsets = np.array(
        [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]
    )

    neighbor_counts = np.zeros(n, np.int64)

    # pass 1: count eps-neighbours per point, bucket-pair at a time.
    # Distance masks are NOT cached across buckets — on large fallback
    # clouds the full set is O(Σ|bi|·|bj|) booleans over 27 offsets
    # (hundreds of MB); recomputing per pair in pass 2 keeps memory O(pair)
    for bi, cell in enumerate(uniq):
        mi = members[bi]
        pi = pts[mi]
        for off in offsets:
            key = tuple(cell + off)
            bj = bucket_of.get(key)
            if bj is None:
                continue
            mj = members[bj]
            d2 = ((pi[:, None, :] - pts[mj][None, :, :]) ** 2).sum(-1)
            neighbor_counts[mi] += (d2 <= eps * eps).sum(1)

    core = neighbor_counts >= min_points  # self-inclusive, like sklearn/Open3D

    # pass 2: union core points within eps of each other; attach borders to
    # a core. Only rows with a CORE point on the left can contribute
    # (core-core unions the clusters; core-border attaches the border), so
    # non-core left points are dropped before the Python pair loop
    uf = _UnionFind(n)
    border_owner = np.full(n, -1, np.int64)
    for bi, cell in enumerate(uniq):
        mi = members[bi]
        ci = core[mi]
        if not ci.any():
            continue
        mi_core = mi[ci]
        pi = pts[mi_core]
        for off in offsets:
            key = tuple(cell + off)
            bj = bucket_of.get(key)
            if bj is None:
                continue
            mj = members[bj]
            d2 = ((pi[:, None, :] - pts[mj][None, :, :]) ** 2).sum(-1)
            ii, jj = np.nonzero(d2 <= eps * eps)
            a_idx, b_idx = mi_core[ii], mj[jj]
            b_core = core[b_idx]
            for a, b in zip(a_idx[b_core], b_idx[b_core]):
                uf.union(a, b)
            nb, na = b_idx[~b_core], a_idx[~b_core]
            unset = border_owner[nb] < 0
            border_owner[nb[unset]] = na[unset]

    labels = np.full(n, -1, np.int32)
    roots: dict[int, int] = {}
    for i in range(n):
        if core[i]:
            r = uf.find(i)
            if r not in roots:
                roots[r] = len(roots)
            labels[i] = roots[r]
    for i in range(n):
        if not core[i] and border_owner[i] >= 0:
            labels[i] = labels[uf.find(border_owner[i])]
    return labels


def largest_cluster(points: np.ndarray, eps: float, min_points: int) -> np.ndarray:
    """Indices of the largest DBSCAN cluster (reference mapping.py:110-119)."""
    labels = dbscan(points, eps, min_points)
    valid = labels >= 0
    if not valid.any():
        return np.arange(points.shape[0])
    largest = np.argmax(np.bincount(labels[valid]))
    return np.nonzero(labels == largest)[0]
