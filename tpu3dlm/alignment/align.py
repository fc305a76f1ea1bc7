"""Map alignment: register a maintenance scan onto the gold standard.

Rebuild of the reference's missing ``src/map_alignment/align.py::Alignment``
to its call-site contract (task_def.py:175-187; SURVEY.md §2b):

    Alignment(base_pose_df, comparison_pose_df, base_bboxes,
              comparison_bboxes, visualise).compare(data_folder)
      → (aligned_comparison_bboxes, transformations, base_map, comparison_map)

and the animation contract: ``transformations`` is the recorded list of
stepwise rigid transforms — a pure-translation 4×4 (coarse centroid
alignment) followed by per-iteration ICP increments — which
alignment/visualise.py (and the reference's visualise.py:82-130) replays
with log/exp interpolation.

TPU path: the query cloud is subsampled to a static size and registered
against the FULL-resolution target by the `lax.scan` ICP solvers in
ops/icp.py (hybrid plane+point when a real cloud target provides normals)
with the Pallas nearest-neighbour kernel; coarse stages run on a
multi-resolution subsample, the final stage at full size.
"""

from __future__ import annotations

import dataclasses
import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpu3dlm.mapper.projection import GlobalBoxes
from tpu3dlm.ops.geometry import PRECISE
from tpu3dlm.ops.icp import (
    icp,
    icp_point_to_plane,
    init_residuals_batched,
    pad_target_bucket,
)


# AnchorIndex cache across Alignment instances (ops/ann.py): keyed by
# target-cloud CONTENT, because serving re-registers every capture against
# the same gold cloud through a fresh Alignment each time. Device-resident
# entries (~67 MB at 1M points), so the LRU stays small.
import threading
from collections import OrderedDict

# One lock covers both LRUs below: concurrent captures (ScanWatcher
# concurrency > 1) share the gold-side device placements and ANN indexes,
# and an unguarded get-or-build would either corrupt the OrderedDict
# bookkeeping or build (and upload) the same ~100 MB entry twice.
_CACHE_LOCK = threading.Lock()

_ANN_INDEX_CACHE: OrderedDict = OrderedDict()
_ANN_CACHE_MAX = 4

# Gold-target placement cache, same serving motivation as the ANN cache:
# every capture registers against the SAME gold cloud, but compare() used
# to re-estimate its normals, re-pad it to the sentinel bucket, re-upload
# the padded cloud + normals (~25 MB over the ~950 MB/s tunnel at 1M pts),
# re-subsample the coarse-stage target, and re-draw the init-scoring
# subsample — ~0.1-0.2 s of pure gold-side host work per capture. Entries
# hold the device-resident placements (~28 MB at 1M points) keyed by
# target CONTENT (stale-proof fingerprint) + mesh devices + the knobs that
# shape them; the maintenance (query) side is per-capture and never cached.
_GOLD_CACHE: OrderedDict = OrderedDict()
_GOLD_CACHE_MAX = 2


def _target_fingerprint(x: np.ndarray) -> tuple:
    """Cheap content key for a host point cloud: shape + blake2b over a
    strided ≤4096-row sample, PLUS f64 sum/sum-of-squares over ALL rows
    (~3 ms at 1M points). The sample alone would miss an in-place edit
    confined to rows between the stride points (a regenerated gold cloud
    with the same point count); any coordinate change anywhere moves the
    full-array moments."""
    import hashlib

    n = x.shape[0]
    sample = np.ascontiguousarray(x[:: max(1, n // 4096)])
    x64 = x.astype(np.float64, copy=False)
    moments = (float(x64.sum()), float((x64 * x64).sum()))
    return (
        n,
        hashlib.blake2b(sample.tobytes(), digest_size=16).digest(),
        moments,
    )


@dataclasses.dataclass
class RegistrationVerdict:
    """Registration-confidence verdict, computed from values the fused
    compare program already reads back (VERDICT r4 weak #4: rmse /
    inlier_frac were measured and then only logged — a degenerate or
    out-of-basin capture silently poisoned the comparison CSV with false
    MISSING rows). Zero extra device dispatches: every input is either in
    the single end-of-compare readback or cheap host numpy.

    Failure modes covered (thresholds from the measured convergence
    envelope, docs/ALIGNMENT_ENVELOPE.md):

      low_overlap       inlier_frac below floor — the scans share too
                        little geometry for the transform to be trusted
                        (partial captures, wrong room);
      high_rmse         converged far from the surface — out-of-basin
                        init or non-rigid disagreement;
      box_mismatch      the aligned signage does not land on the gold
                        signage (mean same-label centroid distance above
                        the match threshold) — geometry locked onto a
                        symmetric/flipped basin the semantic anchors
                        reject (the 180°-flip incident, PERF.md);
      ambiguous_init    another init candidate with a large relative
                        rotation scored within ``init_margin_min`` of the
                        chosen one — the scan is too symmetric for the
                        init choice to be trusted;
      degenerate_geometry  near-planar query cloud with NO box anchors on
                        one/both sides: a featureless plane constrains
                        neither in-plane translation nor in-plane
                        rotation, so even a perfect rmse is meaningless.
    """

    ok: bool
    reasons: tuple[str, ...]
    rmse: float
    inlier_frac: float
    box_residual_m: float | None  # MEAN anchor residual; None = no boxes
    box_residual_max_m: float | None  # MAX — the box_mismatch signal
    init_margin: float | None  # runner-up/chosen residual ratio (rot>45°)
    planarity: float  # λ_min/λ_max of the query-cloud covariance
    n_anchor_boxes: int

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


def _relative_angles_deg(T_cands: np.ndarray, chosen: np.ndarray) -> np.ndarray:
    """Rotation angle (deg) of each candidate RELATIVE to the chosen
    transform — ambiguity only matters between candidates that disagree."""
    R_rel = T_cands[:, :3, :3] @ chosen[:3, :3].T
    cos = (np.trace(R_rel, axis1=1, axis2=2) - 1.0) / 2.0
    return np.degrees(np.arccos(np.clip(cos, -1.0, 1.0)))


def _poses_to_array(pose_df) -> np.ndarray:
    """Accept a pandas DataFrame (reference shape) or an (F, 7) array."""
    if hasattr(pose_df, "columns"):
        cols = ["tx", "ty", "tz", "qx", "qy", "qz", "qw"]
        return pose_df[cols].to_numpy(dtype=np.float32)
    return np.asarray(pose_df, np.float32)


def _boxes_to_records(bboxes) -> list[dict]:
    """Flatten GlobalBoxes or the reference dict-of-frames record shape into
    [{frame, corners (4,3), damage, conf, label}]."""
    records = []
    if isinstance(bboxes, GlobalBoxes):
        bboxes = bboxes.to_frame_dict()
    for frame, rows in sorted(bboxes.items()):
        for row in rows:
            corners = np.stack([np.asarray(c, np.float32) for c in row[:4]])
            records.append(
                {
                    "frame": int(frame),
                    "corners": corners,
                    "damage": int(row[4]),
                    "conf": float(row[5]),
                    "label": int(row[6]),
                }
            )
    return records


def _records_to_frame_dict(records: list[dict]) -> dict[int, list[list]]:
    out: dict[int, list[list]] = {}
    for r in records:
        out.setdefault(r["frame"], []).append(
            [r["corners"][i] for i in range(4)] + [r["damage"], r["conf"], r["label"]]
        )
    return out


def _pad_box_arrays(records: list[dict]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(centroids (Nb, 3), labels (Nb,), mask (Nb,)) bucket-padded so one
    compiled fused-compare program serves every capture's box count
    (utils/shapes.next_bucket — same policy as the auction padding)."""
    from tpu3dlm.utils.shapes import next_bucket

    n = len(records)
    nb = next_bucket(max(n, 1), 16)
    cent = np.zeros((nb, 3), np.float32)
    lab = np.full((nb,), -1, np.int32)
    mask = np.zeros((nb,), bool)
    for i, r in enumerate(records):
        cent[i] = r["corners"].mean(axis=0)
        lab[i] = r["label"]
        mask[i] = True
    return cent, lab, mask


def _box_anchor_residuals(Ts, bc, bl, bm, cc, cl, cm):
    """Device twin of the host ``Alignment._box_residual`` semantics: per
    candidate transform, the mean over (masked) comparison boxes of the
    distance from the moved centroid to the nearest same-label base-box
    centroid, falling back to the nearest ANY-label base centroid when the
    label is absent on the base side. Runs inside the fused compare program
    so candidate selection needs no host round-trip."""
    same = (cl[:, None] == bl[None, :]) & bm[None, :]  # (Nc, Nb)
    anyb = jnp.broadcast_to(bm[None, :], same.shape)
    has_same = jnp.any(same, axis=1, keepdims=True)
    pool = jnp.where(has_same, same, anyb)  # (Nc, Nb)

    def per_T(T):
        moved = jnp.matmul(cc, T[:3, :3].T, precision=PRECISE) + T[:3, 3]
        d = jnp.linalg.norm(bc[None, :, :] - moved[:, None, :], axis=-1)
        dmin = jnp.min(jnp.where(pool, d, jnp.inf), axis=1)  # (Nc,)
        w = cm.astype(jnp.float32)
        return jnp.sum(jnp.where(cm, dmin, 0.0)) / jnp.maximum(jnp.sum(w), 1.0)

    return jax.vmap(per_T)(Ts.astype(jnp.float32))


@partial(
    jax.jit,
    static_argnames=("global_init", "dists", "iterations", "use_pallas", "ann_top_p"),
)
def _fused_compare_program(
    T_cands,  # (K, 4, 4) — row 0 = centroid init, rows 1: = PCA candidates
    angles,  # (K-1,) rotation angle (degrees) of each PCA candidate
    score_q,  # (n_score, 3) | None — init-scoring query subsample
    score_t,  # (m_score, 3) | None — init-scoring target subsample
    anchors,  # None | (base_cent, base_lab, base_mask, comp_cent, comp_lab, comp_mask)
    stages,  # per-ICP-stage (query, target, normals|None, AnchorIndex|None)
    match,  # None | (base_cent, base_lab, base_mask, comp_cent, comp_lab, comp_mask, unmatch_cost)
    *,
    global_init: str,
    dists: tuple,
    iterations: int,
    use_pallas: bool,
    ann_top_p: int = 4,
):
    """The whole warm-path compare as ONE device program (round-4 fusion).

    Before this, a steady-state compare dispatched ≥5 separate groups —
    init scoring, one per ICP stage, the auction matching — each paying the
    remote tunnel's per-dispatch round trip, leaving the device ~75% idle
    across the leg (PERF.md round-5 xprof). Fusing them into a single jit
    also lets XLA dead-code-eliminate the non-final stages' exact
    measurement sweeps (their rmse/inlier outputs are unused), which were
    the most expensive ops in the old per-stage programs.

    Returns a dict; keys vary with the static mode flags:
      T, steps, rmse, inlier              — always
      init_res, init_best, init_use_pca   — when global_init != "centroid"
      match_assign, match_matched         — when ``match`` is provided
    """
    out = {}
    if global_init == "centroid":
        T = T_cands[0]
    else:
        res = init_residuals_batched(score_q, score_t, T_cands, use_pallas=use_pallas)
        if anchors is not None:
            res = res + _box_anchor_residuals(T_cands, *anchors)
        best = jnp.argmin(res[1:])
        if global_init == "pca":
            use_pca = jnp.asarray(True)
        else:
            # auto: PCA only when it clearly beats centroid AND implies a
            # large rotation (small rotations are already in the ICP basin)
            use_pca = (res[1:][best] < 0.7 * res[0]) & (angles[best] > 30.0)
        T = jnp.where(use_pca, T_cands[1:][best], T_cands[0])
        out.update(init_res=res, init_best=best, init_use_pca=use_pca)

    steps = []
    res_icp = None
    for (qj, tj, nj, t_index), d in zip(stages, dists):
        kw = dict(
            init_transform=T,
            max_correspondence_dist=float(d),
            iterations=iterations,
            use_pallas=use_pallas,
            target_index=t_index,
            ann_top_p=ann_top_p,
        )
        if nj is not None:
            res_icp = icp_point_to_plane(qj, tj, nj, **kw)
        else:
            res_icp = icp(qj, tj, **kw)
        steps.append(res_icp.step_transforms)
        T = res_icp.transform  # chains to the next stage with no host sync
    out.update(T=T, steps=tuple(steps), rmse=res_icp.rmse, inlier=res_icp.inlier_frac)

    if match is not None:
        from tpu3dlm.ops.matching import auction_assign

        mb_c, mb_l, mb_m, mc_c, mc_l, mc_m, thr = match
        moved = jnp.matmul(mc_c, T[:3, :3].T, precision=PRECISE) + T[:3, 3]
        d = jnp.linalg.norm(mb_c[:, None, :] - moved[None, :, :], axis=-1)
        ok = (mb_l[:, None] == mc_l[None, :]) & mb_m[:, None] & mc_m[None, :]
        cost = jnp.where(ok, d, jnp.inf).astype(jnp.float32)
        assign, matched = auction_assign(cost, unmatch_cost=thr)
        out.update(match_assign=assign, match_matched=matched)
    return out


def _subsample(points: np.ndarray, n: int, seed: int = 0) -> np.ndarray:
    if points.shape[0] == 0:
        # a bare ZeroDivisionError from the tiling below is a terrible
        # diagnostic for "this capture produced no registration geometry"
        raise ValueError(
            "cannot subsample an empty point set — the map has no cloud, "
            "poses, or boxes to register with"
        )
    if points.shape[0] <= n:
        reps = -(-n // points.shape[0])
        return np.tile(points, (reps, 1))[:n]
    idx = np.random.default_rng(seed).choice(points.shape[0], n, replace=False)
    return points[idx]


class Alignment:
    """Aligns the comparison (maintenance) map onto the base (gold-std) map."""

    def __init__(
        self,
        base_pose_df,
        comparison_pose_df,
        base_bboxes,
        comparison_bboxes,
        visualise: bool = False,
        base_cloud: np.ndarray | None = None,
        comparison_cloud: np.ndarray | None = None,
        max_points: int = 16384,
        icp_iterations: int = 30,
        max_correspondence_dist: float | tuple[float, ...] = (1.0, 0.25, 0.1),
        use_pallas: bool | None = None,
        mesh=None,  # jax.sharding.Mesh → shard the ICP query axis over it
        coarse_query_cap: int = 4096,
        coarse_target_cap: int = 262_144,
        global_init: str = "auto",  # "centroid" | "pca" | "auto"
        ann: str = "auto",  # "auto" | "on" | "off" — anchor-bucketed NN
        # when set, the fused compare program also solves the bipartite
        # box assignment (base records vs aligned comparison records) at
        # this unmatch threshold, exposed as ``self.last_match`` — so a
        # following BBoxComparison with the same threshold costs zero
        # device dispatches (pass it as ``precomputed_match``). None
        # disables the fused matching.
        match_dist_threshold: float | None = 0.5,
        # registration-confidence gate thresholds (RegistrationVerdict).
        # Defaults derive from the measured convergence envelope
        # (docs/ALIGNMENT_ENVELOPE.md, scripts/alignment_envelope.py):
        # passing synthetic captures measure inlier_frac ≈ 1.0 and rmse
        # ≈ 1e-2 m; the failure scenes (30% overlap, 90° out-of-basin,
        # featureless plane) separate by >2× on at least one signal.
        verdict_inlier_floor: float = 0.35,
        verdict_rmse_ceiling: float = 0.08,
        verdict_planarity_floor: float = 1e-4,
        verdict_init_margin_min: float = 1.15,
    ):
        self.base_poses = _poses_to_array(base_pose_df)
        self.comparison_poses = _poses_to_array(comparison_pose_df)
        self.base_records = _boxes_to_records(base_bboxes)
        self.comparison_records = _boxes_to_records(comparison_bboxes)
        self.visualise = visualise
        self.max_points = max_points
        self.icp_iterations = icp_iterations
        self.max_correspondence_dist = max_correspondence_dist
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        self.mesh = mesh
        self.coarse_query_cap = coarse_query_cap
        self.coarse_target_cap = coarse_target_cap
        if global_init not in ("centroid", "pca", "auto"):
            raise ValueError(f"unknown global_init {global_init!r}")
        self.global_init = global_init
        if ann not in ("auto", "on", "off"):
            raise ValueError(f"unknown ann {ann!r}")
        self.ann = ann
        self.match_dist_threshold = match_dist_threshold
        self.last_match: dict | None = None
        self.verdict_inlier_floor = verdict_inlier_floor
        self.verdict_rmse_ceiling = verdict_rmse_ceiling
        self.verdict_planarity_floor = verdict_planarity_floor
        self.verdict_init_margin_min = verdict_init_margin_min
        self.last_verdict: RegistrationVerdict | None = None
        self.logger = logging.getLogger(__name__)

        # registration point sets: full clouds when available, else the
        # trajectory + box-corner geometry (always present in the pickle
        # contract, task_def.py:60-67)
        self.base_cloud = base_cloud
        self.comparison_cloud = comparison_cloud
        self.transformations: list = []
        self.final_transform = np.eye(4, dtype=np.float32)

    def _registration_sets(self) -> tuple[np.ndarray, np.ndarray]:
        def build(poses, records, cloud):
            if cloud is not None and len(cloud):
                return np.asarray(cloud, np.float32)
            pts = [poses[:, :3]]
            for r in records:
                pts.append(r["corners"])
            return np.concatenate(pts).astype(np.float32)

        base = build(self.base_poses, self.base_records, self.base_cloud)
        comp = build(self.comparison_poses, self.comparison_records, self.comparison_cloud)
        return base, comp

    def _box_residual(self, T: np.ndarray) -> float | None:
        """Mean distance from T·(comparison box centroid) to the nearest
        same-label base box centroid — SEMANTIC anchors for ranking inits.

        Planar scans are often flip-symmetric to pure geometry (a wall
        scores the same aligned or turned 180°, and ICP converges happily
        into the flipped basin with near-perfect rmse); the detected
        signage is not symmetric, and its labels travel with the boxes.
        Falls back to label-agnostic distance when a label is absent on the
        base side; returns None when either record set is empty."""
        stats = self._box_residual_stats(T)
        return None if stats is None else stats[0]

    def _box_residual_stats(self, T: np.ndarray) -> tuple[float, float] | None:
        """(mean, max) of the per-box anchor residuals under ``T``.

        The mean ranks init candidates; the MAX feeds the verdict's
        box_mismatch check — a near-symmetric scene can flip so that a
        symmetric PAIR of same-label boxes land on each other's gold
        twins while a single asymmetric box dissents by a metre, and the
        mean dilutes that dissent below threshold (measured on the
        envelope sweep: a 179° flip with t_err 6.4 m scored mean 0.43
        vs max 1.2). One dissenting anchor is enough to distrust the
        registration."""
        if not self.base_records or not self.comparison_records:
            return None
        by_label: dict[int, list[np.ndarray]] = {}
        for r in self.base_records:
            by_label.setdefault(r["label"], []).append(r["corners"].mean(0))
        all_base = np.stack([r["corners"].mean(0) for r in self.base_records])
        ds = []
        for r in self.comparison_records:
            c = r["corners"].mean(0) @ T[:3, :3].T + T[:3, 3]
            pool = by_label.get(r["label"])
            pool = np.stack(pool) if pool else all_base
            ds.append(float(np.linalg.norm(pool - c, axis=1).min()))
        return float(np.mean(ds)), float(np.max(ds))

    def _init_candidates(self, comp_s: np.ndarray, base_s: np.ndarray, gold: dict):
        """Host-side candidate generation for the coarse initialisation.

        Returns (T_cands (K, 4, 4), angles (K-1,), pending): row 0 of
        T_cands is the centroid translation, the rest the principal-axes
        candidates; the *scoring and selection* among them run inside the
        fused compare program (``_fused_compare_program``), so compare()
        needs no mid-pipeline sync. ``pending`` carries what
        ``_resolve_init_steps`` needs to reconstruct the recorded animation
        steps after the single end-of-compare batched readback; for
        global_init="centroid" it resolves immediately ("static_steps").

        centroid/PCA moments are host-numpy (full clouds arrive at a
        different size per capture — a device version would retrace +
        remote-compile per scan, ops/icp.centroid_align_np); the gold-side
        moments are cached per gold cloud (``gold["moments"]``), so the
        per-capture cost is the comparison-side 16k-subsample moments only.

        The candidate score is clipped-mean cloud NN distance PLUS the
        box-anchor term (_box_anchor_residuals / _box_residual): geometry
        alone cannot distinguish a 180° flip of a near-symmetric planar
        scan, the labeled sign boxes can.
        """
        from tpu3dlm.ops.icp import centroid_align_np, pca_init_candidates_np

        moments = gold.get("moments")
        Tc = centroid_align_np(comp_s, base_s, target_moments=moments)
        if self.global_init == "centroid":
            return (
                Tc[None].astype(np.float32),
                np.zeros((0,), np.float32),
                {"static_steps": [Tc]},
            )
        cands = pca_init_candidates_np(comp_s, base_s, target_moments=moments)
        T_cands = np.concatenate([Tc[None], cands]).astype(np.float32)
        # candidate geometry (rotation angles) is host math on the host Ts
        cos = (np.trace(cands[:, :3, :3], axis1=1, axis2=2) - 1.0) / 2.0
        angles = np.degrees(np.arccos(np.clip(cos, -1.0, 1.0))).astype(np.float32)
        center = (
            moments[0] if moments is not None else base_s.mean(axis=0)
        ).astype(np.float32)
        pending = {"Tc": Tc, "cands": cands, "angles": angles, "center": center}
        return T_cands, angles, pending

    def _resolve_init_steps(self, pending: dict, host_vals) -> list:
        """Animation-contract init steps, built from the readback values.

        recorded_steps honor the animation contract — a pure-translation
        4×4, plus an (R, center) rotation tuple when a principal-axes init
        is chosen (the two forms visualise.py replays, SURVEY.md §2b)."""
        if "static_steps" in pending:
            return list(pending["static_steps"])
        res, best, use_pca = host_vals
        best = int(best)
        use_pca = bool(use_pca)
        angle = float(pending["angles"][best])
        self.logger.info(
            "global init: centroid residual %.3f m, best PCA candidate %.3f m "
            "(%.0f° rotation) → %s",
            float(res[0]), float(res[1:][best]), angle,
            "pca" if use_pca else "centroid",
        )
        if not use_pca:
            return [pending["Tc"]]
        T_init = pending["cands"][best].astype(np.float32)
        R, t_full = T_init[:3, :3], T_init[:3, 3]
        center = pending["center"]
        # decompose T_init = rot_about(R, center) ∘ translate(tr) so the
        # animation shows a slide then a turn (solve R·(p+tr)+(c−R·c)=R·p+t)
        tr = R.T @ (t_full - center) + center
        T0 = np.eye(4, dtype=np.float32)
        T0[:3, 3] = tr
        return [T0, (R, center)]

    def _place_target(self, t, nrm):
        """Device placement of a (target, normals) pair — replicated over
        the mesh when one is set (queries shard, targets replicate;
        parallel/nn.shard_queries)."""
        tj = jnp.asarray(t)
        nj = jnp.asarray(nrm) if nrm is not None else None
        if self.mesh is not None:
            repl = jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec()
            )
            tj = jax.device_put(tj, repl)
            if nj is not None:
                nj = jax.device_put(nj, repl)
        return tj, nj

    def _place_query(self, q):
        """Query rows shard over the mesh's batch axis; rows pad by
        repetition — a repeated point only double-counts an existing
        constraint."""
        qj = jnp.asarray(q)
        if self.mesh is not None:
            n_dev = self.mesh.devices.size
            extra = (-qj.shape[0]) % n_dev
            if extra:
                qj = jnp.concatenate([qj, qj[:extra]])
            qj = jax.device_put(
                qj,
                jax.sharding.NamedSharding(
                    self.mesh,
                    jax.sharding.PartitionSpec(self.mesh.axis_names[0]),
                ),
            )
        return qj

    def _gold_entry(self, base_s: np.ndarray, normals_wanted: bool,
                    mesh_key) -> dict:
        """Fetch-or-build the device-resident gold-target placements.

        Entry fields (lazy where the need depends on per-capture state):
          fp          — content fingerprint of the unpadded target
          full        — (padded points, padded normals) placed on device
          init_t      — 65536-pt device subsample for init scoring
          coarse      — ((placed points, placed normals), fp) for the
                        coarse-stage target, filled on first need
        """
        fp = _target_fingerprint(base_s)
        key = (fp, mesh_key, self.coarse_target_cap, normals_wanted)
        with _CACHE_LOCK:
            entry = _GOLD_CACHE.get(key)
            if entry is not None:
                _GOLD_CACHE.move_to_end(key)
                return entry
            normals_np = None
            if normals_wanted:
                from tpu3dlm.ops.pointcloud import estimate_normals_grid

                normals_np = estimate_normals_grid(base_s)
            from tpu3dlm.ops.icp import target_moments_np

            entry = {
                "fp": fp,
                "full": self._place_target(*pad_target_bucket(base_s, normals_np)),
                "init_t": jnp.asarray(_subsample(base_s, 65536, seed=1)),
                # f64 moments of the gold cloud (subsampled per
                # ops/icp._moment_sample) — feed the per-capture host init
                # candidates without re-running the 256k f64 passes
                "moments": target_moments_np(base_s),
                "_normals_np": normals_np,
                "coarse": None,
            }
            _GOLD_CACHE[key] = entry
            while len(_GOLD_CACHE) > _GOLD_CACHE_MAX:
                _GOLD_CACHE.popitem(last=False)
            return entry

    def _gold_coarse(self, entry: dict, base_s: np.ndarray):
        """Coarse-stage target placement, built once per gold entry
        (lock-guarded: concurrent captures share the gold entry)."""
        with _CACHE_LOCK:
            return self._gold_coarse_locked(entry, base_s)

    def _gold_coarse_locked(self, entry: dict, base_s: np.ndarray):
        if entry["coarse"] is None:
            normals_np = entry["_normals_np"]
            if base_s.shape[0] > self.coarse_target_cap:
                t_idx = np.random.default_rng(1).choice(
                    base_s.shape[0], self.coarse_target_cap, replace=False
                )
                t_c = base_s[t_idx]
                n_c = normals_np[t_idx] if normals_np is not None else None
                fp_c = _target_fingerprint(t_c)
            else:
                t_c, n_c, fp_c = base_s, normals_np, entry["fp"]
            entry["coarse"] = (
                self._place_target(*pad_target_bucket(t_c, n_c)), fp_c
            )
        return entry["coarse"]

    def compare(self, data_folder: str = ""):
        """Run registration; returns
        (aligned_comparison_bboxes, transformations, base_map, aligned_comparison_map)."""
        base, comp = self._registration_sets()
        # raw (UNALIGNED) registration sets, kept for the animation: the
        # visualiser replays the recorded transforms onto the comparison
        # cloud, so it must start from the unaligned points — feeding it
        # the aligned return value would apply the whole chain twice
        self.base_points = base
        self.comparison_points = comp
        # only the QUERY cloud is subsampled (it bounds the solve size); the
        # target stays full-resolution — the tiled NN kernels stream it
        # (Pallas: 16k × 1M in ~47 ms on v5e-1, PERF.md), so decimating it
        # would throw away registration accuracy for nothing
        base_s = np.asarray(base, np.float32)
        comp_s = _subsample(comp, self.max_points)

        self.logger.info(
            "Aligning %s: %d pts (query subsampled to %d) → %d-pt target",
            data_folder, comp.shape[0], comp_s.shape[0], base.shape[0],
        )

        # Gold-side device state (normals, padded+placed targets, init
        # subsample) is content-cached across compare() calls — in serving,
        # every capture registers against the same gold cloud (_GOLD_CACHE).
        # Target padding: power-of-two buckets with far sentinels, because
        # every capture has a different cloud size and exact-size shapes
        # would recompile the NN/ICP programs per scan (sentinels can never
        # win a correspondence, so the solve is unchanged — ops/icp).
        # Normals gate on the ACTUAL registration target being the real
        # cloud: an empty-but-not-None base_cloud falls back to sparse
        # pose+corner geometry in _registration_sets, whose "normals" are
        # meaningless — that case must keep the point-to-point solve. With
        # a real cloud target the solver is POINT-TO-PLANE (grid-PCA target
        # normals): point-to-point ICP slides tangentially along the
        # dominant planes of man-made scans and can diverge under partial
        # overlap; the plane residual n·(p−q) is tangent-invariant.
        mesh_key = (
            None
            if self.mesh is None
            else tuple(int(d.id) for d in self.mesh.devices.flat)
        )
        base_is_cloud = self.base_cloud is not None and len(self.base_cloud) > 0
        normals_wanted = base_is_cloud and len(base_s) >= 1000
        gold = self._gold_entry(base_s, normals_wanted, mesh_key)

        # coarse init: centroid translation, plus a principal-axes rotation
        # when the scan arrives badly rotated (global_init="auto"|"pca").
        # Candidate GENERATION is host math (cached gold moments); the
        # scoring and choice run inside the fused program below, and the
        # animation record joins the single end-of-compare readback
        # (_resolve_init_steps)
        T_cands, angles, init_pending = self._init_candidates(comp_s, base_s, gold)
        score_q = score_t = None
        if self.global_init != "centroid":
            # fixed sizes (tiling small clouds up, _subsample) so one
            # compiled program serves every scan; duplicated target points
            # leave NN distances unchanged, duplicated query points only
            # reweight the mean negligibly (ranking heuristic)
            score_q = jnp.asarray(_subsample(comp_s, 2048))
            score_t = gold["init_t"]
        box_arrays = None
        if self.base_records and self.comparison_records:
            box_arrays = (
                _pad_box_arrays(self.base_records),
                _pad_box_arrays(self.comparison_records),
            )
        anchors = None
        if box_arrays is not None and self.global_init != "centroid":
            anchors = (*box_arrays[0], *box_arrays[1])

        # fine: coarse-to-fine ICP stages — shrinking the correspondence
        # radius escapes the planar-scene local minima a single loose radius
        # settles into; every iteration's increment is recorded.
        # Multi-resolution: coarse stages run on subsampled query AND target
        # (NN cost ∝ N·M, so a 4×/4× reduction is ~16× per coarse stage);
        # the FINAL stage always runs the full query budget against the
        # full-size target, so registration accuracy is set by full
        # resolution — decimation only accelerates the basin search.
        dists = self.max_correspondence_dist
        if isinstance(dists, (int, float)):
            dists = (float(dists),)
        dists = tuple(float(x) for x in dists)  # hashable static jit arg
        coarse = None  # ((qj, tj, nj), target fingerprint)
        if len(dists) > 1 and (
            comp_s.shape[0] > self.coarse_query_cap
            or base_s.shape[0] > self.coarse_target_cap
        ):
            (tj_c, nj_c), fp_c = self._gold_coarse(gold, base_s)
            q_c = _subsample(comp_s, min(self.coarse_query_cap, comp_s.shape[0]))
            coarse = ((self._place_query(q_c), tj_c, nj_c), fp_c)
        tj_f, nj_f = gold["full"]
        full = ((self._place_query(comp_s), tj_f, nj_f), gold["fp"])

        # per-stage (query, target, normals, index) — the indexes come from
        # the cross-capture content-keyed cache (_index_for)
        indices = {}  # id(target placement) → AnchorIndex | None
        stages = []
        for si, d in enumerate(dists):
            final = si == len(dists) - 1 or coarse is None
            (qj, tj, nj), tgt_fp = full if final else coarse
            key = id(tj)
            if key not in indices:
                indices[key] = self._index_for(tj, tgt_fp, mesh_key)
            stages.append((qj, tj, nj, indices[key]))

        # fused matching: solve the bipartite assignment of base records vs
        # the ALIGNED comparison records inside the same program, so a
        # following BBoxComparison (same threshold) dispatches nothing
        match_args = None
        if self.match_dist_threshold is not None and box_arrays is not None:
            match_args = (
                *box_arrays[0],
                *box_arrays[1],
                jnp.float32(self.match_dist_threshold),
            )

        # ONE device dispatch for the whole warm path: init scoring +
        # candidate selection + every ICP stage + the final exact
        # measurement + the box assignment (``_fused_compare_program``) —
        # then ONE batched readback. Before the fusion the same leg paid
        # ≥5 dispatch groups' worth of tunnel round-trips (PERF.md).
        out = _fused_compare_program(
            jnp.asarray(T_cands),
            jnp.asarray(angles),
            score_q,
            score_t,
            anchors,
            tuple(stages),
            match_args,
            global_init=self.global_init,
            dists=dists,
            iterations=self.icp_iterations,
            use_pallas=self.use_pallas,
        )
        from tpu3dlm.utils.host import to_host

        host = to_host(out)

        init_host = ()
        if "static_steps" not in init_pending:
            init_host = (host["init_res"], host["init_best"], host["init_use_pca"])
        self.transformations = self._resolve_init_steps(init_pending, init_host)
        for steps in host["steps"]:
            self.transformations += [steps[i] for i in range(steps.shape[0])]
        self.final_transform = host["T"]
        self.logger.info(
            "ICP done: rmse=%.4f inliers=%.1f%%",
            float(host["rmse"]), 100 * float(host["inlier"]),
        )
        self.last_verdict = self._registration_verdict(
            host, T_cands, comp_s, init_pending
        )
        if not self.last_verdict.ok:
            self.logger.warning(
                "ALIGNMENT SUSPECT (%s): rmse=%.4f inliers=%.2f "
                "box_residual=%s init_margin=%s planarity=%.2e",
                ",".join(self.last_verdict.reasons),
                self.last_verdict.rmse, self.last_verdict.inlier_frac,
                self.last_verdict.box_residual_m,
                self.last_verdict.init_margin, self.last_verdict.planarity,
            )

        self.last_match = None
        if match_args is not None:
            n_real = len(self.base_records)
            m_real = len(self.comparison_records)
            a = host["match_assign"]
            ok = host["match_matched"]
            # trim the bucket padding on BOTH axes (same policy as
            # BBoxComparison): padded rows drop, an assignment to a padded
            # column counts as unmatched
            self.last_match = {
                "assign": np.where(ok & (a < m_real), a, -1)[:n_real].astype(np.int64),
                "threshold": float(self.match_dist_threshold),
                "n": n_real,
                "m": m_real,
            }

        # apply the final transform to every comparison box corner
        T = self.final_transform
        aligned_records = []
        for r in self.comparison_records:
            aligned_records.append(
                {**r, "corners": (r["corners"] @ T[:3, :3].T + T[:3, 3]).astype(np.float32)}
            )
        aligned_bboxes = _records_to_frame_dict(aligned_records)

        comp_aligned = comp @ T[:3, :3].T + T[:3, 3]
        return aligned_bboxes, self.transformations, base, comp_aligned

    def _registration_verdict(
        self, host: dict, T_cands: np.ndarray, comp_s: np.ndarray,
        init_pending: dict,
    ) -> RegistrationVerdict:
        """Build the registration-confidence verdict (class docstring of
        RegistrationVerdict). Host math only — every device value is
        already in the single end-of-compare readback."""
        reasons: list[str] = []
        rmse = float(host["rmse"])
        inlier = float(host["inlier"])
        if inlier < self.verdict_inlier_floor:
            reasons.append("low_overlap")
        if rmse > self.verdict_rmse_ceiling:
            reasons.append("high_rmse")

        # semantic-anchor consistency of the FINAL transform (host numpy
        # over <=64 box centroids). The MAX per-box residual, not the
        # mean: one dissenting anchor beyond the match threshold means
        # the transform cannot be matching what the mean says it matches
        # (symmetric-pair dilution — _box_residual_stats docstring)
        stats = self._box_residual_stats(self.final_transform)
        box_res = box_max = None
        if stats is not None:
            box_res, box_max = stats
        n_boxes = min(len(self.base_records), len(self.comparison_records))
        thr = self.match_dist_threshold or 0.5
        if box_max is not None and box_max > thr:
            reasons.append("box_mismatch")

        # init ambiguity: a candidate rotated >45° away from the chosen
        # transform scoring within init_margin_min of it means geometry
        # alone could not disambiguate the basin (near-symmetric scan)
        init_margin = None
        if "static_steps" not in init_pending and "init_res" in host:
            res = np.asarray(host["init_res"], np.float64)
            chosen = (
                T_cands[1:][int(host["init_best"])]
                if bool(host["init_use_pca"])
                else T_cands[0]
            )
            rel = _relative_angles_deg(T_cands, np.asarray(chosen))
            chosen_res = float(
                res[1:][int(host["init_best"])]
                if bool(host["init_use_pca"]) else res[0]
            )
            far = rel > 45.0
            if far.any() and chosen_res > 0:
                init_margin = float(res[far].min() / max(chosen_res, 1e-9))
                # only *ambiguous* when the anchors could not break the tie
                # either: with same-label boxes present the anchor term
                # already separated the flips inside the fused program
                if init_margin < self.verdict_init_margin_min and n_boxes == 0:
                    reasons.append("ambiguous_init")

        # degenerate geometry: near-planar query with no semantic anchors —
        # in-plane translation/rotation is unconstrained, so rmse/inliers
        # can look perfect while the transform is arbitrary
        c = comp_s - comp_s.mean(axis=0)
        ev = np.linalg.eigvalsh((c.T @ c) / max(len(c), 1))
        planarity = float(ev[0] / max(ev[-1], 1e-12))
        if n_boxes == 0 and planarity < self.verdict_planarity_floor:
            reasons.append("degenerate_geometry")

        return RegistrationVerdict(
            ok=not reasons,
            reasons=tuple(reasons),
            rmse=rmse,
            inlier_frac=inlier,
            box_residual_m=None if box_res is None else float(box_res),
            box_residual_max_m=None if box_max is None else float(box_max),
            init_margin=init_margin,
            planarity=planarity,
            n_anchor_boxes=n_boxes,
        )

    def _index_for(self, tj, fp, mesh_key):
        """Anchor-bucketed NN index (ops/ann.py) for one stage target: one
        index build per distinct target, amortised over every ICP iteration
        — the fine stage drops from ~47 ms to single-digit ms per sweep at
        1M-pt targets. "auto" engages it only where the exact sweep is
        expensive; the measurement pass inside the solvers stays exact
        either way, so reported rmse/inliers are exact for the returned
        transform. Indexes are cached ACROSS compare calls keyed by target
        content: in serving, every capture registers against the same gold
        cloud, so the ~150 ms of per-capture index builds amortises to
        zero. (``fp`` is the already-computed fingerprint of the unpadded
        target — the gold entry carries it, so no per-capture recompute.)"""
        if self.ann == "off":
            return None
        m = int(tj.shape[0])
        if self.ann == "auto" and m < 131_072:
            return None
        from tpu3dlm.ops.ann import build_anchor_index, default_index_shape

        c, b = default_index_shape(m)
        if c > m:
            return None
        key = (fp, m, c, b, self.use_pallas, mesh_key)
        with _CACHE_LOCK:
            cached = _ANN_INDEX_CACHE.get(key)
            if cached is not None:
                _ANN_INDEX_CACHE.move_to_end(key)
                return cached
            index = build_anchor_index(
                tj, n_anchors=c, bucket_cap=b, use_pallas=self.use_pallas
            )
            _ANN_INDEX_CACHE[key] = index
            while len(_ANN_INDEX_CACHE) > _ANN_CACHE_MAX:
                _ANN_INDEX_CACHE.popitem(last=False)
            return index
