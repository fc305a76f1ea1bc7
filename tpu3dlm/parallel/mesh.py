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


def distributed_init(coordinator: str | None = None, **kwargs) -> None:
    """Multi-host bring-up (`jax.distributed.initialize`). No-op when the
    process is already initialised or single-host args are absent."""
    try:
        if coordinator is not None:
            jax.distributed.initialize(coordinator_address=coordinator, **kwargs)
        else:
            jax.distributed.initialize(**kwargs)
    except RuntimeError:
        pass  # already initialised
