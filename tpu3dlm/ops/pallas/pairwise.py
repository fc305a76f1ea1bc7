"""Tiled nearest-neighbour search — the ICP hot loop as a Pallas TPU kernel.

The reference's map alignment rests on Open3D's C++ KD-tree correspondence
search (SURVEY.md §2c); on TPU, brute-force tiled pairwise distances beat
pointer-chasing trees: the cross term -2·A·Bᵀ rides the MXU, tiles stream
through VMEM, and a running (min, argmin) folds over reference tiles in
scratch, so the full N×M distance matrix never materialises in HBM —
O(N·M) compute with O(TN·TM) memory.

`nearest_neighbors(a, b)` → for every point in `a`, the index and squared
distance of its nearest point in `b`. Pallas kernel on TPU; identical-result
XLA fallback (`nearest_neighbors_xla`) everywhere else.

Measured on v5e-1 (readback-forced timing): 16384 × 1M points in ~69 ms.
The VPU min/argmin dominates; the MXU cross term is effectively free. The
kernel drops the per-row-constant |a|² from the tracked minimum (argmin is
unchanged; |a|² is added back once at emit) and streams |b|² in as a
precomputed (1, M) input instead of recomputing it per i-tile — together
with (2048, 2048) tiles that took the probe sweep from 87 ms to 69 ms
(scripts/bench_nn_variants.py; v2 iota-min and the "parallel" dimension
hint measured neutral). Earlier tile sweep at the pre-v1 kernel:
(256,512) 342 ms, (512,2048) 127 ms, (1024,2048) 85 ms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# feature dim padded 3 → 8 so the MXU contraction has a clean K
_K = 8
_BIG = 1e30  # python float: jnp scalars would be captured consts in the kernel


def _nn_kernel(a_ref, b_ref, b2_ref, idx_ref, d2_ref, min_d2, min_idx, *, tile_m: int):
    """Tracks m = min(|b|² - 2 a·b) per query row: |a|² is constant per row,
    so argmin is unchanged and |a|² is added back once at emit time. |b|²
    arrives precomputed as a (1, TM) input (one fewer VPU pass per tile)."""
    j = pl.program_id(1)
    num_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        min_d2[:] = jnp.full_like(min_d2, _BIG)
        min_idx[:] = jnp.zeros_like(min_idx)

    a = a_ref[:]  # (TN, K)
    b = b_ref[:]  # (TM, K)
    # |a - b|^2 = |a|^2 - 2 a·b + |b|^2 ; cross term on the MXU
    cross = jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        # full-f32 multi-pass: the TPU default single bf16 pass rounds the
        # cross term to ~0.1 m^2 at scan scale, which flips ~half the argmin
        # picks (tests/test_precision.py); the kernel is VPU-min-bound, so
        # the extra MXU passes are hidden
        precision=jax.lax.Precision.HIGHEST,
    )  # (TN, TM)
    dp = b2_ref[:] - 2.0 * cross  # (TN, TM); b2 broadcast from (1, TM)

    tile_min = jnp.min(dp, axis=1, keepdims=True)  # (TN, 1)
    tile_arg = jnp.argmin(dp, axis=1).reshape(-1, 1).astype(jnp.int32)  # (TN, 1)
    tile_arg = tile_arg + j * tile_m

    better = tile_min < min_d2[:]
    min_d2[:] = jnp.where(better, tile_min, min_d2[:])
    min_idx[:] = jnp.where(better, tile_arg, min_idx[:])

    @pl.when(j == num_j - 1)
    def _emit():
        a2 = jnp.sum(a * a, axis=1, keepdims=True)  # (TN, 1)
        idx_ref[:] = min_idx[:]
        d2_ref[:] = jnp.maximum(min_d2[:] + a2, 0.0)


def _pad_points(x: jax.Array, tile: int, pad_value: float) -> jax.Array:
    n = x.shape[0]
    n_pad = (-n) % tile
    x8 = jnp.zeros((n + n_pad, _K), jnp.float32)
    x8 = x8.at[:n, :3].set(x.astype(jnp.float32))
    if n_pad:
        x8 = x8.at[n:, :3].set(pad_value)
    return x8


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_m"))
def nearest_neighbors_pallas(
    a: jax.Array,  # (N, 3) query points
    b: jax.Array,  # (M, 3) reference points
    tile_n: int = 2048,
    tile_m: int = 2048,
) -> tuple[jax.Array, jax.Array]:
    """(indices (N,), squared distances (N,)) of NN in b for each a point."""
    n, m = a.shape[0], b.shape[0]
    a8 = _pad_points(a, tile_n, 0.0)
    b8 = _pad_points(b, tile_m, 1e15)  # padded refs are unreachable
    N, M = a8.shape[0], b8.shape[0]
    b2 = jnp.sum(b8 * b8, axis=1)[None, :]  # (1, M), streamed per j-tile

    grid = (N // tile_n, M // tile_m)
    idx, d2 = pl.pallas_call(
        functools.partial(_nn_kernel, tile_m=tile_m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, _K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, _K), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_n, 1), jnp.float32),
            pltpu.VMEM((tile_n, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * M * _K,
            bytes_accessed=(N * _K + (N // tile_n) * M * (_K + 1) + 2 * N) * 4,
            transcendentals=0,
        ),
    )(a8, b8, b2)
    return idx[:n, 0], d2[:n, 0]


@functools.partial(jax.jit, static_argnames=("chunk", "chunk_b"))
def nearest_neighbors_xla(
    a: jax.Array, b: jax.Array, chunk: int = 1024, chunk_b: int = 4096
) -> tuple[jax.Array, jax.Array]:
    """Double-chunked XLA fallback with identical semantics (runs anywhere).

    Tiles BOTH axes: the distance matrix lives only chunk × chunk_b at a
    time with a running (min, argmin) folded over reference chunks — so a
    full-size (e.g. 1M-pt) target cloud streams through without ever
    materialising N×M in memory, mirroring the Pallas kernel's scratch
    accumulation."""
    n, m = a.shape[0], b.shape[0]
    n_pad = (-n) % chunk
    a_p = jnp.pad(a.astype(jnp.float32), ((0, n_pad), (0, 0)))
    m_pad = (-m) % chunk_b
    # padded refs sit at 1e15 → d2 ≈ 3e30, never the minimum (same sentinel
    # as the Pallas kernel's _pad_points)
    b_p = jnp.pad(
        b.astype(jnp.float32), ((0, m_pad), (0, 0)), constant_values=1e15
    )
    b_tiles = b_p.reshape(-1, chunk_b, 3)
    offsets = jnp.arange(b_tiles.shape[0], dtype=jnp.int32) * chunk_b

    def body(a_chunk):
        a2 = jnp.sum(a_chunk * a_chunk, axis=1, keepdims=True)

        def fold(carry, tile):
            best_d2, best_idx = carry
            bc, off = tile
            d2 = (a2 - 2.0 * jnp.matmul(a_chunk, bc.T,
                                        precision=jax.lax.Precision.HIGHEST)
                  + jnp.sum(bc * bc, axis=1)[None, :])
            tile_min = jnp.min(d2, axis=1)
            tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32) + off
            better = tile_min < best_d2
            return (
                jnp.where(better, tile_min, best_d2),
                jnp.where(better, tile_arg, best_idx),
            ), None

        init = (jnp.full(chunk, _BIG, jnp.float32), jnp.zeros(chunk, jnp.int32))
        (best_d2, best_idx), _ = jax.lax.scan(fold, init, (b_tiles, offsets))
        return best_idx, jnp.maximum(best_d2, 0.0)

    idx, d2 = jax.lax.map(body, a_p.reshape(-1, chunk, 3))
    return idx.reshape(-1)[:n], d2.reshape(-1)[:n]


def nearest_neighbors(a: jax.Array, b: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Dispatch: Pallas kernel on TPU, XLA fallback elsewhere."""
    if jax.default_backend() == "tpu":
        return nearest_neighbors_pallas(jnp.asarray(a), jnp.asarray(b))
    return nearest_neighbors_xla(jnp.asarray(a), jnp.asarray(b))
