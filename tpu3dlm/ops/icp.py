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

from tpu3dlm.ops.geometry import PRECISE
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
    H = jnp.matmul((sc * w[:, None]).T, dc, precision=PRECISE)  # (3, 3) covariance
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(jnp.matmul(Vt.T, U.T, precision=PRECISE))
    D = jnp.diag(jnp.stack([1.0, 1.0, det]))  # reflection guard
    R = jnp.matmul(jnp.matmul(Vt.T, D, precision=PRECISE), U.T, precision=PRECISE)
    t = mu_d - jnp.matmul(R, mu_s, precision=PRECISE)
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


def _increment_magnitude(T_inc: jax.Array) -> jax.Array:
    """Scalar size of a rigid increment: |t| + rotation angle (radians) —
    both in metre-ish units at scan scale, so one tolerance covers both."""
    cos = jnp.clip((jnp.trace(T_inc[:3, :3]) - 1.0) / 2.0, -1.0, 1.0)
    return jnp.linalg.norm(T_inc[:3, 3]) + jnp.arccos(cos)


def _run_icp_loop(live_inc, measure, T0, iterations, early_stop_tol):
    """Shared driver for both ICP solvers.

    Static-length ``lax.scan`` whose iterations freeze to identity
    increments once converged (``lax.cond`` skips the dominant NN sweep;
    identity increments pad the animation record), then ONE measurement
    pass under the FINAL transform — so ``ICPResult.rmse``/``inlier_frac``
    describe the transform actually returned, not the previous iterate
    (the in-loop residuals are evaluated before the iteration's increment
    is applied). ``measure`` must report rmse = inf when nothing matches:
    a zero-inlier "perfect 0.0" would make a total registration failure
    rank above every honest solve.
    """

    def step(carry, _):
        T, done = carry
        T_inc = jax.lax.cond(
            done, lambda _t: jnp.eye(4, dtype=jnp.float32), live_inc, T
        )
        T_new = jnp.matmul(T_inc, T, precision=PRECISE)
        done = done | (_increment_magnitude(T_inc) < early_stop_tol)
        return (T_new, done), T_inc

    (T_final, _), incs = jax.lax.scan(
        step, (T0, jnp.asarray(False)), None, length=iterations
    )
    rmse, frac = measure(T_final)
    return ICPResult(
        transform=T_final, step_transforms=incs, rmse=rmse, inlier_frac=frac
    )


def _make_nn(use_pallas: bool, target_index, ann_top_p: int):
    """(iteration_nn, exact_nn): the per-iteration correspondence search and
    the exact kernel for the final measurement pass.

    When an AnchorIndex (ops/ann.py) is supplied, iterations route through
    the anchor-bucketed two-level search (~10× cheaper per sweep at 1M-point
    targets); measurement ALWAYS stays exact so the reported rmse /
    inlier_frac describe the returned transform without approximation."""
    exact = nearest_neighbors_pallas if use_pallas else nearest_neighbors_xla
    if target_index is None:
        return exact, exact
    from tpu3dlm.ops.ann import nn_anchored

    return (lambda q, _tgt: nn_anchored(q, target_index, top_p=ann_top_p)), exact


@partial(
    jax.jit,
    static_argnames=("iterations", "use_pallas", "early_stop_tol", "ann_top_p"),
)
def icp(
    source: jax.Array,  # (N, 3) — cloud to move
    target: jax.Array,  # (M, 3) — fixed cloud
    init_transform: jax.Array | None = None,
    max_correspondence_dist: float = 0.5,
    iterations: int = 20,
    use_pallas: bool = False,
    early_stop_tol: float = 1e-5,
    target_index=None,  # ops/ann.AnchorIndex over `target` → fast iterations
    ann_top_p: int = 4,
) -> ICPResult:
    """Rigid ICP: returns final transform + per-iteration increments.

    Static shapes: callers subsample clouds to fixed sizes beforehand
    (alignment/align.py handles that), so one compile serves every scan.

    ``early_stop_tol``: once an iteration's increment magnitude (|t| +
    rotation angle) falls below this, remaining iterations skip the NN
    sweep via `lax.cond` — the trace stays static-length (identity
    increments pad the animation record) but the dominant NN cost stops
    when the solve has converged. 0 disables.

    ``target_index``: optional anchor-bucketed index built over ``target``
    (ops/ann.build_anchor_index). Iterations then use the two-level
    approximate search (recall contract in ops/ann.py); the measurement
    pass stays exact.
    """
    nn, nn_exact = _make_nn(use_pallas, target_index, ann_top_p)
    src0 = source.astype(jnp.float32)
    tgt = target.astype(jnp.float32)
    T0 = jnp.eye(4, dtype=jnp.float32) if init_transform is None else init_transform.astype(jnp.float32)
    max_d2 = max_correspondence_dist**2

    def live_inc(T):
        moved = jnp.matmul(src0, T[:3, :3].T, precision=PRECISE) + T[:3, 3]
        idx, d2 = nn(moved, tgt)
        w = (d2 <= max_d2).astype(jnp.float32)
        return kabsch(moved, tgt[idx], w)

    def measure(T):
        moved = jnp.matmul(src0, T[:3, :3].T, precision=PRECISE) + T[:3, 3]
        _, d2 = nn_exact(moved, tgt)
        w = (d2 <= max_d2).astype(jnp.float32)
        sw = jnp.sum(w)
        rmse = jnp.where(
            sw > 0, jnp.sqrt(jnp.sum(d2 * w) / jnp.maximum(sw, 1.0)), jnp.inf
        )
        return rmse, jnp.mean(w)

    return _run_icp_loop(live_inc, measure, T0, iterations, early_stop_tol)


@partial(
    jax.jit,
    static_argnames=("iterations", "use_pallas", "early_stop_tol", "ann_top_p"),
)
def icp_point_to_plane(
    source: jax.Array,  # (N, 3) — cloud to move
    target: jax.Array,  # (M, 3) — fixed cloud
    target_normals: jax.Array,  # (M, 3) unit normals (ops/pointcloud.py)
    init_transform: jax.Array | None = None,
    max_correspondence_dist: float = 0.5,
    iterations: int = 20,
    use_pallas: bool = False,
    damping: float = 1e-6,
    point_weight: float = 0.1,
    early_stop_tol: float = 1e-5,
    target_index=None,  # ops/ann.AnchorIndex over `target` → fast iterations
    ann_top_p: int = 4,
) -> ICPResult:
    """Hybrid plane+point ICP (Gauss-Newton on the linearised SE(3) step).

    Why it exists alongside the pure point-to-point solver: on man-made
    scenes (walls, floors — exactly the reference's vehicle interiors)
    point-to-point ICP slides tangentially along the dominant planes and
    can *diverge* under partial overlap, because tangential motion is
    rewarded by denser plane interiors. The plane residual n·(p−q) is
    tangent-invariant, so it cannot slide — but it is also BLIND along
    plane-parallel directions, so a small ``point_weight``·‖p−q‖² term
    supplies the boundary/patch signal that pins the remaining degrees of
    freedom. The hybrid handles both the fully-perpendicular and the
    all-parallel-planes scene classes.

    Per iteration: NN correspondences (same tiled kernels), damped 6×6
    normal-equation solve over both residuals, increment exp(ω), t composed
    onto T. Returns per-iteration increments for the animation contract,
    like `icp`.
    """
    from tpu3dlm.ops.geometry import so3_exp

    nn, nn_exact = _make_nn(use_pallas, target_index, ann_top_p)
    src0 = source.astype(jnp.float32)
    tgt = target.astype(jnp.float32)
    nrm = target_normals.astype(jnp.float32)
    T0 = jnp.eye(4, dtype=jnp.float32) if init_transform is None else init_transform.astype(jnp.float32)
    max_d2 = max_correspondence_dist**2

    def live_inc(T):
        moved = jnp.matmul(src0, T[:3, :3].T, precision=PRECISE) + T[:3, 3]
        idx, d2 = nn(moved, tgt)
        q = tgt[idx]
        n = nrm[idx]
        w = (d2 <= max_d2).astype(jnp.float32)

        # plane term: r = n·(p−q), J row = [(p×n)ᵀ nᵀ]
        r = jnp.sum((moved - q) * n, axis=-1)  # (N,)
        a = jnp.cross(moved, n)  # (N, 3)
        J = jnp.concatenate([a, n], axis=-1)  # (N, 6)
        Jw = J * w[:, None]
        H = jnp.matmul(Jw.T, J, precision=PRECISE)  # (6, 6)
        g = jnp.matmul(Jw.T, r, precision=PRECISE)  # (6,)

        # point term: e = p−q (3 rows/corr), J = [−[p]×  I]
        e = moved - q  # (N, 3)
        Z = jnp.zeros_like(moved[:, 0])
        px, py, pz = moved[:, 0], moved[:, 1], moved[:, 2]
        skew = jnp.stack(
            [jnp.stack([Z, -pz, py], -1),
             jnp.stack([pz, Z, -px], -1),
             jnp.stack([-py, px, Z], -1)], axis=1
        )  # (N, 3, 3) = [p]×
        eye3 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), skew.shape)
        Jp = jnp.concatenate([-skew, eye3], axis=2)  # (N, 3, 6)
        Jpw = Jp * w[:, None, None]
        H = H + point_weight * jnp.einsum("nij,nik->jk", Jpw, Jp, precision=PRECISE)
        g = g + point_weight * jnp.einsum("nij,ni->j", Jpw, e, precision=PRECISE)

        lam = damping * jnp.trace(H) + 1e-12
        xi = jnp.linalg.solve(H + lam * jnp.eye(6), -g)
        R_inc = so3_exp(xi[:3])
        T_inc = jnp.eye(4, dtype=jnp.float32)
        T_inc = T_inc.at[:3, :3].set(R_inc)
        T_inc = T_inc.at[:3, 3].set(xi[3:])
        return T_inc

    def measure(T):
        # rmse in this solver's own residual: the plane distance n·(p−q)
        moved = jnp.matmul(src0, T[:3, :3].T, precision=PRECISE) + T[:3, 3]
        idx, d2 = nn_exact(moved, tgt)
        r = jnp.sum((moved - tgt[idx]) * nrm[idx], axis=-1)
        w = (d2 <= max_d2).astype(jnp.float32)
        sw = jnp.sum(w)
        rmse = jnp.where(
            sw > 0, jnp.sqrt(jnp.sum(r * r * w) / jnp.maximum(sw, 1.0)), jnp.inf
        )
        return rmse, jnp.mean(w)

    return _run_icp_loop(live_inc, measure, T0, iterations, early_stop_tol)


def centroid_align(source: jax.Array, target: jax.Array) -> jax.Array:
    """4×4 pure translation moving the source centroid onto the target's —
    the standard coarse initialisation recorded as the first animation step
    (visualise.py consumes pure-translation 4×4s, SURVEY.md §2b)."""
    t = jnp.mean(target, axis=0) - jnp.mean(source, axis=0)
    T = jnp.eye(4, dtype=jnp.float32)
    return T.at[:3, 3].set(t)


@jax.jit
def pca_init_candidates(source: jax.Array, target: jax.Array) -> jax.Array:
    """Global initialisation by principal-axes alignment: (4, 4, 4) candidates.

    ICP only converges from inside its basin; a maintenance scan captured
    facing the other way (large initial rotation) never reaches it from the
    centroid init. Aligning the clouds' PCA frames is the classic
    rotation-free-basin fix, but eigenvectors carry a per-axis sign
    ambiguity — flipping any two axes keeps the basis right-handed — so this
    returns all 4 proper-rotation candidates (centroid translation composed
    in); the caller scores them by nearest-neighbour residual and keeps the
    best (alignment/align.py).
    """
    src = source.astype(jnp.float32)
    tgt = target.astype(jnp.float32)
    mu_s = jnp.mean(src, axis=0)
    mu_t = jnp.mean(tgt, axis=0)
    sc = src - mu_s
    tc = tgt - mu_t
    Cs = jnp.matmul(sc.T, sc, precision=PRECISE) / src.shape[0]
    Ct = jnp.matmul(tc.T, tc, precision=PRECISE) / tgt.shape[0]
    _, Vs = jnp.linalg.eigh(Cs)  # columns: eigenvectors, ascending eigenvalue
    _, Vt = jnp.linalg.eigh(Ct)
    # force right-handed bases so every candidate below is a proper rotation
    Vs = Vs.at[:, 0].multiply(jnp.sign(jnp.linalg.det(Vs)))
    Vt = Vt.at[:, 0].multiply(jnp.sign(jnp.linalg.det(Vt)))
    signs = jnp.array(
        [[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]], jnp.float32
    )

    def mk(s):
        R = jnp.matmul(jnp.matmul(Vt, jnp.diag(s), precision=PRECISE), Vs.T,
                       precision=PRECISE)
        T = jnp.eye(4, dtype=jnp.float32)
        T = T.at[:3, :3].set(R)
        return T.at[:3, 3].set(mu_t - jnp.matmul(R, mu_s, precision=PRECISE))

    return jax.vmap(mk)(signs)


@partial(jax.jit, static_argnames=("use_pallas",))
def init_residual(
    source: jax.Array, target: jax.Array, T: jax.Array, use_pallas: bool = False
) -> jax.Array:
    """Clipped-mean nearest-neighbour distance of T·source into target — the
    score used to rank initialisation candidates. The clip (5% of the target
    bbox diagonal) bounds the non-overlapping tail that partial scans always
    have, while the mean stays sensitive to minority structure (e.g. sign
    patches on an otherwise flip-symmetric wall) that a median would ignore.

    Single-candidate convenience over ``init_residuals_batched`` (one
    implementation of the score — the serving path calls the batched form
    directly)."""
    return init_residuals_batched(source, target, T[None], use_pallas)[0]


@partial(jax.jit, static_argnames=("use_pallas",))
def init_residuals_batched(
    source: jax.Array,  # (N, 3)
    target: jax.Array,  # (M, 3)
    Ts: jax.Array,  # (K, 4, 4) candidate inits
    use_pallas: bool = False,
) -> jax.Array:
    """init_residual for a stack of K candidates in ONE NN sweep: the K
    transformed copies of ``source`` concatenate into a single (K·N, 3)
    query. vmapping init_residual instead dispatches K separate kernels
    whose per-sweep overhead dominates at init-scoring sizes — measured
    ~120 ms for 5 candidates at 2048×65536 on v5e-1 vs ~10 ms batched."""
    nn = nearest_neighbors_pallas if use_pallas else nearest_neighbors_xla
    tgt = target.astype(jnp.float32)
    src = source.astype(jnp.float32)
    moved = jax.vmap(
        lambda T: jnp.matmul(src, T[:3, :3].T, precision=PRECISE) + T[:3, 3]
    )(Ts.astype(jnp.float32))  # (K, N, 3)
    _, d2 = nn(moved.reshape(-1, 3), tgt)
    diag = jnp.linalg.norm(jnp.max(tgt, axis=0) - jnp.min(tgt, axis=0))
    clipped = jnp.minimum(jnp.sqrt(d2), 0.05 * diag)
    return jnp.mean(clipped.reshape(Ts.shape[0], -1), axis=1)


# above this size the host moment math (f64 means/covariances) stops being
# "~ms" — 0.23 s of a 1.25 s compare leg at 1M points on the 1-core host —
# so moments run on a fixed-seed with-replacement subsample instead. The
# statistical error on a 256k sample of a scan-scale cloud is sub-mm on the
# centroid and negligible on the PCA axes; both feed ICP *inits*, which the
# solve refines. Below the cap the math is exact, so the device twins and
# their cross-check tests see identical values.
_MOMENT_SAMPLE_CAP = 262144


def _moment_sample(x, cap: int = _MOMENT_SAMPLE_CAP, seed: int = 0):
    import numpy as np

    x = np.asarray(x)
    if x.shape[0] <= cap:
        return x
    # with-replacement: an index draw is O(cap); a permutation (without
    # replacement) is O(n) and was itself a measurable host cost
    idx = np.random.default_rng(seed).integers(0, x.shape[0], cap)
    return x[idx]


def target_moments_np(target):
    """(mu, C) f64 moments of the (``_moment_sample``-subsampled) cloud —
    exactly the values ``centroid_align_np`` / ``pca_init_candidates_np``
    derive from their ``target`` argument, exposed so a serving cache can
    compute them ONCE per gold cloud (alignment/align._GOLD_CACHE) instead
    of re-running the 256k-sample f64 passes on every capture."""
    import numpy as np

    t = np.asarray(_moment_sample(target), np.float64)
    mu = t.mean(axis=0)
    tc = t - mu
    return mu, tc.T @ tc / t.shape[0]


def centroid_align_np(source, target, target_moments=None):
    """Host-numpy twin of ``centroid_align`` — moment math on (subsampled,
    see _moment_sample) clouds is ~ms on the host but forces a
    per-cloud-size retrace + remote compile on device (every capture has a
    different point count), so the serving path computes inits on the
    host. Cross-checked vs the JAX version in tests/test_icp_matching.py.

    ``target_moments``: optional precomputed ``target_moments_np(target)``
    (numerically identical — same subsample seed)."""
    import numpy as np

    mu_t = (
        target_moments[0]
        if target_moments is not None
        else np.mean(np.asarray(_moment_sample(target), np.float64), axis=0)
    )
    t = mu_t - np.mean(np.asarray(_moment_sample(source), np.float64), axis=0)
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = t.astype(np.float32)
    return T


def pca_init_candidates_np(source, target, target_moments=None):
    """Host-numpy twin of ``pca_init_candidates`` (same eigh/sign recipe);
    see centroid_align_np for why this exists (and for ``target_moments``)."""
    import numpy as np

    src = np.asarray(_moment_sample(source), np.float64)
    mu_s = src.mean(axis=0)
    sc = src - mu_s
    Cs = sc.T @ sc / src.shape[0]
    if target_moments is not None:
        mu_t, Ct = target_moments
    else:
        mu_t, Ct = target_moments_np(target)
    _, Vs = np.linalg.eigh(Cs)
    _, Vt = np.linalg.eigh(Ct)
    Vs[:, 0] *= np.sign(np.linalg.det(Vs)) or 1.0
    Vt[:, 0] *= np.sign(np.linalg.det(Vt)) or 1.0
    signs = np.array([[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]], np.float64)
    out = np.empty((4, 4, 4), np.float32)
    for i, s in enumerate(signs):
        R = Vt @ np.diag(s) @ Vs.T
        T = np.eye(4, dtype=np.float64)
        T[:3, :3] = R
        T[:3, 3] = mu_t - R @ mu_s
        out[i] = T.astype(np.float32)
    return out


# target clouds arrive at a different size every capture; compiling the NN
# sweep per exact size would recompile the ICP stack per scan in a serving
# deployment. Padding the TARGET to a power-of-two bucket with far-away
# sentinels is EXACT for the solve: a sentinel can never be any query
# point's nearest neighbour while a real point exists within the
# correspondence radius, so weights/rmse/inliers are untouched.
PAD_SENTINEL = 1.0e6


def pad_target_bucket(points, normals=None, min_bucket: int = 1024):
    """(points, normals) zero-risk padded to the next power-of-two size.

    Returns (padded_points, padded_normals) — normals pass through None."""
    import numpy as np

    m = points.shape[0]
    bucket = max(min_bucket, 1 << (max(m - 1, 1)).bit_length())
    if bucket == m:
        return points, normals
    pad = np.full((bucket - m, 3), PAD_SENTINEL, points.dtype)
    out = np.concatenate([points, pad])
    if normals is None:
        return out, None
    npad = np.zeros((bucket - m, 3), normals.dtype)
    npad[:, 2] = 1.0
    return out, np.concatenate([normals, npad])


def rotation_about(R: jax.Array, center: jax.Array) -> jax.Array:
    """4×4 rotating by R about a fixed point (t = c − R·c)."""
    T = jnp.eye(4, dtype=jnp.float32)
    T = T.at[:3, :3].set(R)
    return T.at[:3, 3].set(center - jnp.matmul(R, center, precision=PRECISE))
