"""Multi-chip nearest-neighbour search over the device mesh.

Two scaling axes for the ICP hot loop (ops/pallas/pairwise.py), matching
the framework's long-input story (SURVEY.md §5 — the reference's analogous
axis is points-per-scan, which it handles by decimation):

* **query-sharded** — shard the (N, 3) query cloud over the ``batch`` mesh
  axis with the target replicated. Embarrassingly parallel: no collectives.
  This needs no special code — `jax.device_put` the query with a batch
  sharding and call the normal kernels/ICP; XLA partitions the whole
  program (tested in tests/test_parallel.py). `shard_queries` is the
  convenience helper.

* **target-sharded** — shard the (M, 3) TARGET cloud over the mesh when it
  exceeds one chip's HBM: each device finds local minima against its
  target shard, then an `all_gather` of (d², global index) pairs and an
  argmin across shards produce exactly the single-device result.
  `target_sharded_nn` builds that shard_map program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu3dlm.ops.pallas.pairwise import nearest_neighbors_pallas, nearest_neighbors_xla


def shard_queries(mesh: Mesh, a, b):
    """Place (query, target) for query-sharded NN/ICP: query rows shard over
    the mesh's batch axis, target replicates. The mesh size must divide the
    query length (parallel/mesh.pad_to_devices pads it up)."""
    axis = mesh.axis_names[0]
    qs = jax.device_put(a, NamedSharding(mesh, P(axis)))
    tr = jax.device_put(b, NamedSharding(mesh, P()))
    return qs, tr


def target_sharded_nn(mesh: Mesh, use_pallas: bool = False):
    """Returns nn(a, b) with the TARGET sharded over the mesh.

    The mesh size must divide b's length; a replicates. Output equals the
    single-device `nearest_neighbors_*` exactly (global indices).
    """
    axis = mesh.axis_names[0]
    base_nn = nearest_neighbors_pallas if use_pallas else nearest_neighbors_xla

    def local(a, b_shard):
        idx, d2 = base_nn(a, b_shard)
        i = jax.lax.axis_index(axis)
        gidx = idx + i * b_shard.shape[0]
        # (ndev, N) stacks of local minima → global argmin per query
        d2_all = jax.lax.all_gather(d2, axis)
        idx_all = jax.lax.all_gather(gidx, axis)
        best = jnp.argmin(d2_all, axis=0)
        out_idx = jnp.take_along_axis(idx_all, best[None, :], axis=0)[0]
        out_d2 = jnp.take_along_axis(d2_all, best[None, :], axis=0)[0]
        return out_idx, out_d2

    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)
