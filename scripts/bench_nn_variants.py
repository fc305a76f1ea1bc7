"""NN-kernel variant probe: can the VPU-bound min/argmin loop go faster?

PERF.md "Nearest-neighbour kernel": at (1024, 2048) tiles the MXU cross
term is effectively free and the per-tile VPU work (d2 assembly + min +
argmin) dominates the 85 ms for 16k × 1M. Variants probed here:

  v0  current production kernel (ops/pallas/pairwise.py)
  v1  a2-dropped: argmin(d2) == argmin(b2 - 2·cross) because |a|² is
      constant per query row — one fewer VPU op per element; a2 is added
      back once at emit time. b2 is also precomputed host-side and
      streamed as a (1, TM) input instead of being recomputed per i-tile.
  v2  min+iota: replace argmin with (min, then compare+iota+min) — probes
      whether Mosaic lowers argmin poorly.
  v3  v1 + dimension_semantics=("parallel", "arbitrary") compiler hint.
  v4  v1 at (2048, 2048) tiles (fewer grid steps, more VMEM per step).

Each variant is verified against nearest_neighbors_xla on a small random
instance before timing (exact index equality — ties broken the same way:
lowest index wins, which both argmin and the iota-min trick guarantee).

Historical note: v0 is whatever production currently ships — since the
limb-decomposition adoption (PERF.md "Exact cross term at bf16 speed")
that is the f32-EXACT kernel, while v1-v4 remain the bf16-noisy probe
variants verified bit-exact against the equally-pinned XLA reference of
their era; compare v0's time against v4 remembering v0 buys exact picks.

Run (TPU): PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_nn_variants.py
Prints one JSON line per variant.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_K = 8
_BIG = 1e30


def _kernel_v1(a_ref, b_ref, b2_ref, idx_ref, d2_ref, min_d2, min_idx,
               *, tile_m: int):
    """a2-dropped + precomputed b2: track m(d') = min(b2 - 2c); argmin is
    unchanged since a2 is constant per row; emit adds a2 once."""
    j = pl.program_id(1)
    num_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        min_d2[:] = jnp.full_like(min_d2, _BIG)
        min_idx[:] = jnp.zeros_like(min_idx)

    a = a_ref[:]
    b = b_ref[:]
    cross = jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = b2_ref[:] - 2.0 * cross  # (TN, TM); b2 broadcast from (1, TM)

    tile_min = jnp.min(dp, axis=1, keepdims=True)
    tile_arg = jnp.argmin(dp, axis=1).reshape(-1, 1).astype(jnp.int32)
    tile_arg = tile_arg + j * tile_m

    better = tile_min < min_d2[:]
    min_d2[:] = jnp.where(better, tile_min, min_d2[:])
    min_idx[:] = jnp.where(better, tile_arg, min_idx[:])

    @pl.when(j == num_j - 1)
    def _emit():
        a2 = jnp.sum(a * a, axis=1, keepdims=True)
        idx_ref[:] = min_idx[:]
        d2_ref[:] = jnp.maximum(min_d2[:] + a2, 0.0)


def _kernel_v2(a_ref, b_ref, b2_ref, idx_ref, d2_ref, min_d2, min_idx,
               *, tile_m: int):
    """min + iota-min instead of argmin (lowest index wins ties, same as
    argmin)."""
    j = pl.program_id(1)
    num_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        min_d2[:] = jnp.full_like(min_d2, _BIG)
        min_idx[:] = jnp.zeros_like(min_idx)

    a = a_ref[:]
    b = b_ref[:]
    cross = jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = b2_ref[:] - 2.0 * cross

    tile_min = jnp.min(dp, axis=1, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, dp.shape, 1)
    hit = dp <= tile_min  # at least one per row
    tile_arg = jnp.min(
        jnp.where(hit, iota, jnp.int32(2**30)), axis=1, keepdims=True
    ) + j * tile_m

    better = tile_min < min_d2[:]
    min_d2[:] = jnp.where(better, tile_min, min_d2[:])
    min_idx[:] = jnp.where(better, tile_arg, min_idx[:])

    @pl.when(j == num_j - 1)
    def _emit():
        a2 = jnp.sum(a * a, axis=1, keepdims=True)
        idx_ref[:] = min_idx[:]
        d2_ref[:] = jnp.maximum(min_d2[:] + a2, 0.0)


def _pad(x, tile, val):
    n = x.shape[0]
    n_pad = (-n) % tile
    x8 = jnp.zeros((n + n_pad, _K), jnp.float32)
    x8 = x8.at[:n, :3].set(x.astype(jnp.float32))
    if n_pad:
        x8 = x8.at[n:, :3].set(val)
    return x8


@functools.partial(
    jax.jit, static_argnames=("kernel", "tile_n", "tile_m", "parallel_i")
)
def nn_variant(a, b, kernel, tile_n=1024, tile_m=2048, parallel_i=False):
    a8 = _pad(a, tile_n, 0.0)
    b8 = _pad(b, tile_m, 1e15)
    N, M = a8.shape[0], b8.shape[0]
    b2 = jnp.sum(b8 * b8, axis=1)[None, :]  # (1, M)
    kfn = {"v1": _kernel_v1, "v2": _kernel_v2}[kernel]
    params = {}
    if parallel_i:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        )
    idx, d2 = pl.pallas_call(
        functools.partial(kfn, tile_m=tile_m),
        grid=(N // tile_n, M // tile_m),
        in_specs=[
            pl.BlockSpec((tile_n, _K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, _K), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_n, 1), jnp.float32),
            pltpu.VMEM((tile_n, 1), jnp.int32),
        ],
        **params,
    )(a8, b8, b2)
    return idx[: a.shape[0], 0], d2[: a.shape[0], 0]


def timed(fn, *args, iters=5):
    # compile + warm, DRAINED before t0: the warmup's execution is enqueued
    # asynchronously, so without a forcing readback here it would land
    # inside the timed window and inflate every per-iter time by
    # ~(iters+1)/iters (~20% at iters=5)
    np.asarray(fn(*args)[0][:8])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    # force via host readback — block_until_ready returns early on axon
    np.asarray(out[0][:8])
    return (time.perf_counter() - t0) / iters


def main():
    from tpu3dlm.utils.backend import enable_compile_cache

    enable_compile_cache()

    from tpu3dlm.ops.pallas.pairwise import (
        nearest_neighbors_pallas,
        nearest_neighbors_xla,
    )

    rng = np.random.default_rng(0)
    # correctness first, tiny instance
    a_s = jnp.asarray(rng.uniform(-2, 2, (512, 3)).astype(np.float32))
    b_s = jnp.asarray(rng.uniform(-2, 2, (4096, 3)).astype(np.float32))
    ref_i, ref_d = (np.asarray(x) for x in nearest_neighbors_xla(a_s, b_s))
    variants = {
        "v1": lambda a, b: nn_variant(a, b, "v1"),
        "v2": lambda a, b: nn_variant(a, b, "v2"),
        "v3": lambda a, b: nn_variant(a, b, "v1", parallel_i=True),
        "v4": lambda a, b: nn_variant(a, b, "v1", tile_n=2048, tile_m=2048),
    }
    # v1-v4 run the bf16-noisy cross term (the probe predates the limb-exact
    # production kernel), while nearest_neighbors_xla is now pinned f32-exact
    # — exact index equality would fail on precision-induced NEAR-TIE flips,
    # which say nothing about the tile-min/tie-break logic being probed.
    # Gate instead on the TRUE f64 distance of each pick: a logic bug
    # (wrong tile offset, broken accumulate-min) lands on a far point, a
    # near-tie flip lands within the bf16 rounding band of the optimum.
    a64 = np.asarray(a_s, np.float64)
    b64 = np.asarray(b_s, np.float64)
    true_d2 = lambda idx: np.sum((a64 - b64[idx]) ** 2, axis=1)
    ref_true = true_d2(ref_i)
    # per-query bound from the bf16 error model: the cross term a·b carries
    # ~|a||b|·2⁻⁸ rounding (PERF.md "NN kernel bf16 idea RETIRED"), so a
    # precision flip can cost up to ~2× that in d²; a LOGIC bug (wrong tile
    # offset, broken accumulate-min) lands O(box-size²) ≈ several m² off
    na = np.linalg.norm(a64, axis=1)
    nb_max = np.linalg.norm(b64, axis=1).max()
    bound = 2.0 ** -7 * na * nb_max + 1e-6
    for name, fn in variants.items():
        gi, gd = (np.asarray(x) for x in fn(a_s, b_s))
        excess = true_d2(gi) - ref_true
        assert (excess >= -1e-9).all(), f"{name}: beat the exact reference?!"
        worst = int((excess - bound).argmax())
        assert (excess <= bound).all(), (
            f"{name}: pick {worst} is {excess[worst]:.4f} m² worse than "
            f"optimal (bf16 bound {bound[worst]:.4f}) — logic bug, not "
            "precision noise"
        )
        flips = int((gi != ref_i).sum())
        print(
            f"{name}: {flips}/{len(ref_i)} near-tie flips vs exact reference, "
            f"max true-d² excess {excess.max():.2e}",
            file=sys.stderr,
        )
    print("correctness OK", file=sys.stderr)

    N, M = 16384, 1 << 20
    a = jnp.asarray(rng.uniform(-3, 3, (N, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-3, 3, (M, 3)).astype(np.float32))
    rows = {"v0_production": timed(nearest_neighbors_pallas, a, b)}
    for name, fn in variants.items():
        rows[name] = timed(fn, a, b)
    for name, dt in rows.items():
        print(json.dumps({
            "metric": f"nn_16k_x_1M_{name}", "value": round(dt * 1e3, 2),
            "unit": "ms", "vs_baseline": round(rows["v0_production"] / dt, 3),
        }))


if __name__ == "__main__":
    main()
