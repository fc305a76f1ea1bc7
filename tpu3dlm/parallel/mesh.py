"""Device mesh + sharding helpers (1-D data-parallel over the batch axis)."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "batch") -> Mesh:
    """1-D mesh over the first n devices (all by default)."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)} "
                "(set XLA_FLAGS=--xla_force_host_platform_device_count=N on CPU)"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def batch_spec(mesh: Mesh) -> P:
    return P(mesh.axis_names[0])


def shard_batch(arrays, mesh: Mesh):
    """Place pytree leaves with the leading axis sharded over the mesh.

    Leading dims must be divisible by the mesh size — pad_to_devices first.
    """
    spec = batch_spec(mesh)

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, arrays)


def replicate(arrays, mesh: Mesh):
    """Replicate a pytree (e.g. model params) across the mesh."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, arrays)


def pad_to_devices(arrays, mesh: Mesh):
    """Pad every leaf's leading axis up to a multiple of the mesh size.

    Returns (padded pytree, original length) — slice outputs back with it.
    """
    n = mesh.devices.size
    lead = None

    def pad(x):
        nonlocal lead
        x = np.asarray(x)
        lead = x.shape[0] if lead is None else lead
        extra = (-x.shape[0]) % n
        if extra:
            x = np.concatenate([x, np.zeros((extra,) + x.shape[1:], x.dtype)])
        return x

    return jax.tree.map(pad, arrays), lead


def distributed_init(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    **kwargs,
) -> None:
    """Multi-host bring-up (`jax.distributed.initialize`).

    The reference has no communication backend at all (SURVEY.md §5); this
    is the framework's: XLA collectives over ICI within a slice and DCN
    across hosts once the distributed runtime is up. With explicit args
    (or TPU metadata in the environment) it initialises that runtime;
    calling it with no args on a single host performs a real 1-process
    bring-up on localhost, so the code path is exercised everywhere.
    No-op if already initialised.

    The already-initialised guard must NOT touch the backends:
    `jax.process_count()` would initialise them, and `initialize` raises
    once backends are up — which this function's RuntimeError swallow
    would then silently turn into a single-process world.
    """
    if jax.distributed.is_initialized():
        return  # distributed runtime already up
    # "multi-process intent" is anything whose world size could exceed 1:
    # an explicit num_processes > 1, or an auto-detected world size
    # (num_processes=None with a coordinator / process_id / passthrough
    # kwargs — cluster-detection modes). Swallowing a failed init for any
    # of those would silently degrade collectives to local reductions.
    # An explicit num_processes=1 is a known 1-process world → safe.
    multi = (
        num_processes > 1
        if num_processes is not None
        else (coordinator is not None or process_id is not None or bool(kwargs))
    )
    try:
        if coordinator is None and num_processes is None and not kwargs:
            # single-host bring-up: a real coordinator on localhost
            jax.distributed.initialize(
                coordinator_address="localhost:12391", num_processes=1, process_id=0
            )
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=num_processes,
                process_id=process_id,
                **kwargs,
            )
    except RuntimeError:
        # Tolerable ONLY for single-process bring-up (backends already up →
        # a 1-process world is what we have anyway). For an explicit
        # multi-process init this would silently degrade every collective
        # to a local reduction — the exact failure the guard above exists
        # to prevent — so it must propagate.
        if multi:
            raise
