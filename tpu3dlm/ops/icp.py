"""Point-to-point ICP registration as a fixed-iteration JAX loop.

TPU-native replacement for the registration inside the reference's missing
``src/map_alignment/align.py`` (contract: iterative rigid alignment of the
maintenance cloud onto the gold standard, recording stepwise transforms for
the animation — SURVEY.md §2b, visualise.py:82-130). Correspondences come
from the tiled Pallas nearest-neighbour kernel (ops/pallas/pairwise.py);
the rigid solve is a masked Kabsch/Umeyama 3×3 SVD; the whole loop is
`lax.scan` with static shapes — one compiled program regardless of cloud
size, per-iteration transforms stacked as outputs.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from tpu3dlm.ops.pallas.pairwise import nearest_neighbors_pallas, nearest_neighbors_xla


def kabsch(
    src: jax.Array,  # (N, 3) source points
    dst: jax.Array,  # (N, 3) matched destination points
    weights: jax.Array,  # (N,) weights (0 = rejected correspondence)
) -> jax.Array:
    """Weighted rigid solve: returns 4×4 T minimising Σ w‖T·src − dst‖²."""
    w = weights / jnp.maximum(jnp.sum(weights), 1e-12)
    mu_s = jnp.sum(src * w[:, None], axis=0)
    mu_d = jnp.sum(dst * w[:, None], axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    H = (sc * w[:, None]).T @ dc  # (3, 3) covariance
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(Vt.T @ U.T)
    D = jnp.diag(jnp.stack([1.0, 1.0, det]))  # reflection guard
    R = Vt.T @ D @ U.T
    t = mu_d - R @ mu_s
    T = jnp.eye(4, dtype=src.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    return T


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ICPResult:
    transform: Any  # (4, 4) final source→destination transform
    step_transforms: Any  # (iters, 4, 4) incremental transform per iteration
    rmse: Any  # () final inlier RMSE
    inlier_frac: Any  # () fraction of source points within max_dist


@partial(jax.jit, static_argnames=("iterations", "use_pallas"))
def icp(
    source: jax.Array,  # (N, 3) — cloud to move
    target: jax.Array,  # (M, 3) — fixed cloud
    init_transform: jax.Array | None = None,
    max_correspondence_dist: float = 0.5,
    iterations: int = 20,
    use_pallas: bool = False,
) -> ICPResult:
    """Rigid ICP: returns final transform + per-iteration increments.

    Static shapes: callers subsample clouds to fixed sizes beforehand
    (alignment/align.py handles that), so one compile serves every scan.
    """
    nn = nearest_neighbors_pallas if use_pallas else nearest_neighbors_xla
    src0 = source.astype(jnp.float32)
    tgt = target.astype(jnp.float32)
    T0 = jnp.eye(4, dtype=jnp.float32) if init_transform is None else init_transform.astype(jnp.float32)
    max_d2 = max_correspondence_dist**2

    def step(T, _):
        moved = src0 @ T[:3, :3].T + T[:3, 3]
        idx, d2 = nn(moved, tgt)
        matched = tgt[idx]
        w = (d2 <= max_d2).astype(jnp.float32)
        T_inc = kabsch(moved, matched, w)
        T_new = T_inc @ T
        rmse = jnp.sqrt(jnp.sum(d2 * w) / jnp.maximum(jnp.sum(w), 1.0))
        frac = jnp.mean(w)
        return T_new, (T_inc, rmse, frac)

    T_final, (incs, rmses, fracs) = jax.lax.scan(step, T0, None, length=iterations)
    return ICPResult(
        transform=T_final,
        step_transforms=incs,
        rmse=rmses[-1],
        inlier_frac=fracs[-1],
    )


def centroid_align(source: jax.Array, target: jax.Array) -> jax.Array:
    """4×4 pure translation moving the source centroid onto the target's —
    the standard coarse initialisation recorded as the first animation step
    (visualise.py consumes pure-translation 4×4s, SURVEY.md §2b)."""
    t = jnp.mean(target, axis=0) - jnp.mean(source, axis=0)
    T = jnp.eye(4, dtype=jnp.float32)
    return T.at[:3, 3].set(t)
