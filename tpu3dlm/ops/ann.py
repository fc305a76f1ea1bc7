"""Anchor-bucketed nearest neighbour: a two-level accelerated NN for ICP.

The exact tiled kernel (ops/pallas/pairwise.py) streams the FULL target per
query sweep — 16k × 1M in ~47 ms on v5e-1 — and ICP calls it once per
iteration (~60-90 sweeps per alignment, ops/icp.py). The sweep is VPU
min/argmin-bound, so its cost is ∝ N·M no matter how the tiles are laid
out. This module trades a one-off index build (amortised over every
iteration against the same target) for a per-query sweep that touches only
a tiny, spatially-relevant slice of the target:

  build  — sample C anchors from the target, assign every target point to
           its nearest anchor (one exact N=M sweep), bucket the points per
           anchor with a static cap B (sort + static scatter; overflow
           beyond B is dropped — see the recall note below).
  query  — distance to the C anchors (an MXU matmul), take the top-P
           nearest anchors, gather their P·B candidate points, exact
           argmin over the candidates. Per-sweep work falls from N·M to
           N·(C + P·B) ≈ N·M/100 at the default shapes.

Approximation contract: the result is EXACT whenever the true nearest
neighbour lives in one of the query's top-P anchor buckets (and was not
dropped by bucket overflow). Anchors are sampled from the target itself, so
anchor density tracks point density and both failure modes are rare on scan
geometry — recall is pinned ≥99.5% in tests/test_ann.py, and ICP composes
the remaining misses away: a missed NN returns a farther candidate, which
the correspondence-radius gate (w = d² ≤ max_d²) downweights exactly like
any other outlier. ICP's *measurement* pass stays on the exact kernel
(ops/icp.py), so reported rmse / inlier_frac are exact for the returned
transform even when the iterations used this index.

Static shapes throughout (serving contract, utils/shapes): (C, B) derive
from the power-of-two padded target bucket (ops/icp.pad_target_bucket), so
one compiled program serves every capture; PAD_SENTINEL points bucket
together under sentinel anchors that no real query ever selects.

Replaces the CPU/Open3D KD-tree role in the reference's alignment stack
(SURVEY.md §2b Alignment; reference task_def.py:175-187) the TPU way:
regular gathers + one matmul instead of pointer-chasing trees.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu3dlm.ops.pallas.pairwise import (
    nearest_neighbors_pallas,
    nearest_neighbors_xla,
)

# coordinate sentinel for empty bucket slots — far beyond any scan AND
# beyond pad_target_bucket's 1e6 target sentinel, so a padded slot can
# never outrank even a padded target point. (1e8)²·3 = 3e16 stays finite
# in f32.
_SLOT_SENTINEL = 1.0e8

# queries are processed in fixed chunks so the gathered candidate block
# (chunk, P·B, 3) stays ~100 MB instead of materialising (N, P·B, 3)
_QUERY_CHUNK = 4096


class AnchorIndex(NamedTuple):
    """Device-resident two-level NN index over one target cloud.

    anchors     (C, 3)  f32 — level-1 routing points (sampled from target)
    buckets     (C, B, 3) f32 — level-2 candidate coords, empty slots at
                _SLOT_SENTINEL
    bucket_ids  (C, B)  i32 — original target indices (0 on empty slots;
                harmless: their sentinel coords can never win the argmin
                while any real candidate exists)
    """

    anchors: jax.Array
    buckets: jax.Array
    bucket_ids: jax.Array

    @property
    def n_anchors(self) -> int:
        return self.anchors.shape[0]

    @property
    def bucket_cap(self) -> int:
        return self.buckets.shape[1]


def default_index_shape(m: int) -> tuple[int, int]:
    """(n_anchors, bucket_cap) for a (power-of-two padded) target size m.

    C = m/128 anchors → mean occupancy 128; B = 4× the mean absorbs the
    density spread of real scans (anchor sampling already tracks density).
    Clamps keep tiny clouds valid and huge clouds' top-k affordable."""
    c = max(64, min(8192, m // 128))
    c = min(c, m)
    b = max(32, min(4096, 4 * max(m // c, 1)))
    return c, b


@partial(jax.jit, static_argnames=("n_anchors", "bucket_cap", "use_pallas"))
def build_anchor_index(
    target: jax.Array,  # (M, 3) — may include pad_target_bucket sentinels
    n_anchors: int,
    bucket_cap: int,
    use_pallas: bool = False,
    seed: int = 0,
) -> AnchorIndex:
    """One exact M×C assignment sweep + a device sort; ~25-60 ms for a
    1M-point target on v5e-1, amortised over every ICP iteration."""
    tgt = target.astype(jnp.float32)
    m = tgt.shape[0]
    c, b = n_anchors, bucket_cap
    if c > m:
        raise ValueError(f"n_anchors {c} > target size {m}")

    # anchors: random subsample WITHOUT replacement — sampling the target
    # itself makes anchor density track point density, which keeps bucket
    # occupancy near-uniform (the overflow-drop guard)
    perm = jax.random.permutation(jax.random.PRNGKey(seed), m)[:c]
    anchors = tgt[perm]

    if use_pallas:
        # query-heavy sweep (M queries ≫ targets): small query tiles keep
        # the kernel inside the scoped-VMEM budget (a 2048-row tile OOMs
        # the 16 MB scoped stack when N is ~1M on v5e)
        assign, _ = nearest_neighbors_pallas(tgt, anchors, tile_n=512)
    else:
        assign, _ = nearest_neighbors_xla(tgt, anchors)
    assign = assign.astype(jnp.int32)

    order = jnp.argsort(assign)  # stable: ids stay grouped by anchor
    sorted_assign = assign[order]
    counts = jnp.bincount(assign, length=c)
    starts = jnp.cumsum(counts) - counts
    rank = jnp.arange(m, dtype=jnp.int32) - starts[sorted_assign].astype(jnp.int32)

    # static scatter: slot = anchor·B + rank; rank ≥ B overflows are routed
    # to an out-of-range index and dropped (mode="drop")
    slot = jnp.where(rank < b, sorted_assign * b + rank, c * b)
    buckets = jnp.full((c * b, 3), _SLOT_SENTINEL, jnp.float32)
    buckets = buckets.at[slot].set(tgt[order], mode="drop")
    ids = jnp.zeros((c * b,), jnp.int32)
    ids = ids.at[slot].set(order.astype(jnp.int32), mode="drop")
    return AnchorIndex(anchors, buckets.reshape(c, b, 3), ids.reshape(c, b))


def _query_chunk(q: jax.Array, index: AnchorIndex, top_p: int):
    """Exact-within-candidates NN for one (chunk, 3) query block."""
    anchors = index.anchors  # (C, 3)
    # |q−a|² ranking: |q|² is constant per row, so −2 q·aᵀ + |a|² ranks
    # identically (same trick as the exact kernel's a²-drop)
    cross = jnp.matmul(q, anchors.T,
                       precision=jax.lax.Precision.HIGHEST)  # (chunk, C) — MXU
    a2 = jnp.sum(anchors * anchors, axis=1)[None, :]
    rank_d2 = a2 - 2.0 * cross
    # top-P by P unrolled argmin+mask passes: `lax.top_k` sorts the whole
    # (chunk, C) rank matrix (~18 ms at 16k×8192 on v5e-1, the single
    # biggest cost of a query sweep; `approx_max_k` measured slower);
    # P simple min-reductions are ~4× cheaper and return the same SET of
    # anchors (tie order may differ — routing only consumes the set)
    cols = []
    for _ in range(top_p):
        j = jnp.argmin(rank_d2, axis=1)
        cols.append(j)
        hit = jax.nn.one_hot(j, rank_d2.shape[1], dtype=jnp.bool_)
        rank_d2 = jnp.where(hit, jnp.inf, rank_d2)
    top = jnp.stack(cols, axis=1)  # (chunk, P)

    cand = index.buckets[top]  # (chunk, P, B, 3)
    diff = q[:, None, None, :] - cand
    d2 = jnp.sum(diff * diff, axis=-1)  # (chunk, P, B) — exact distances
    flat = d2.reshape(q.shape[0], -1)
    j = jnp.argmin(flat, axis=1)
    ids = index.bucket_ids[top].reshape(q.shape[0], -1)
    take = lambda x: jnp.take_along_axis(x, j[:, None], axis=1)[:, 0]
    return take(ids), take(flat)


@partial(jax.jit, static_argnames=("top_p",))
def nn_anchored(
    queries: jax.Array,  # (N, 3)
    index: AnchorIndex,
    top_p: int = 4,
) -> tuple[jax.Array, jax.Array]:
    """(indices (N,), squared distances (N,)) into the ORIGINAL target —
    drop-in for nearest_neighbors_{pallas,xla} modulo the approximation
    contract in the module docstring."""
    q = queries.astype(jnp.float32)
    n = q.shape[0]
    chunk = min(_QUERY_CHUNK, n)
    pad = (-n) % chunk
    if pad:
        q = jnp.concatenate([q, q[:pad]])
    qc = q.reshape(-1, chunk, 3)
    idx, d2 = jax.lax.map(lambda x: _query_chunk(x, index, top_p), qc)
    return idx.reshape(-1)[:n], d2.reshape(-1)[:n]
