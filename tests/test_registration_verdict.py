"""Registration-confidence verdict (alignment/align.RegistrationVerdict):
a low-overlap, degenerate, or out-of-basin capture must be FLAGGED instead
of silently emitting confident-looking MISSING rows (VERDICT r4 weak #4 —
compare() measured rmse/inlier_frac and only logged them; the 180°-flip
incident was caught by a bench gate, not the pipeline).

Quick tier: verdict threshold logic on fabricated readbacks + the CSV /
watch plumbing. Slow tier: the three constructed failure scenes (partial
overlap, featureless plane, 90° out-of-basin centroid init) through REAL
ICP, plus a passing scene asserting rows/statuses unchanged.
"""

import json
import os

import numpy as np
import pytest

from tpu3dlm.alignment import Alignment, BBoxComparison
from tpu3dlm.alignment.align import RegistrationVerdict


def _plane_cloud(n=4000, w=4.0, h=2.5, seed=0, x0=0.0):
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [
            rng.uniform(x0, x0 + w, n),
            rng.uniform(-h / 2, h / 2, n),
            np.full(n, 3.0) + rng.normal(0, 0.001, n),
        ],
        axis=1,
    ).astype(np.float32)
    return pts


def _boxes(centroids, labels, damage=0):
    """frame-dict of 0.2 m square boxes at the given centroids."""
    out = {0: []}
    for c, lab in zip(centroids, labels):
        c = np.asarray(c, np.float32)
        d = np.array([0.1, 0.1, 0.0], np.float32)
        corners = [
            c + [-0.1, -0.1, 0], c + [-0.1, 0.1, 0],
            c + [0.1, 0.1, 0], c + [0.1, -0.1, 0],
        ]
        out[0].append([np.asarray(x, np.float32) for x in corners]
                      + [damage, 0.9, int(lab)])
    return out


def _mk_alignment(base_cloud, comp_cloud, base_boxes=None, comp_boxes=None,
                  **kw):
    poses = np.zeros((2, 7), np.float32)
    poses[:, 6] = 1.0
    return Alignment(
        poses, poses,
        base_boxes if base_boxes is not None else {0: []},
        comp_boxes if comp_boxes is not None else {0: []},
        base_cloud=base_cloud, comparison_cloud=comp_cloud,
        max_points=2048, icp_iterations=15,
        max_correspondence_dist=(1.0, 0.25, 0.1),
        **kw,
    )


class TestVerdictLogic:
    """Threshold logic on fabricated readback values — no device work."""

    def _align(self, with_boxes=True):
        cents = [(0.0, 0.0, 2.8), (1.0, 0.5, 2.8)]
        boxes = _boxes(cents, [0, 1]) if with_boxes else {0: []}
        a = _mk_alignment(_plane_cloud(), _plane_cloud(seed=1),
                          base_boxes=boxes, comp_boxes=boxes)
        a.final_transform = np.eye(4, dtype=np.float32)
        return a

    def _verdict(self, a, rmse=0.01, inlier=0.98, comp_s=None):
        host = {"rmse": np.float32(rmse), "inlier": np.float32(inlier)}
        comp_s = comp_s if comp_s is not None else _plane_cloud(
            seed=2
        ) + np.array([0, 0, 0.3]) * np.random.default_rng(3).uniform(
            0, 1, (4000, 1)
        ).astype(np.float32)  # non-planar
        T_cands = np.eye(4, dtype=np.float32)[None]
        return a._registration_verdict(host, T_cands, comp_s,
                                       {"static_steps": [T_cands[0]]})

    def test_clean_pass(self):
        v = self._verdict(self._align())
        assert isinstance(v, RegistrationVerdict)
        assert v.ok and v.reasons == ()
        assert v.box_residual_m is not None and v.box_residual_m < 0.01

    def test_low_inlier_flagged(self):
        v = self._verdict(self._align(), inlier=0.2)
        assert not v.ok and "low_overlap" in v.reasons

    def test_high_rmse_flagged(self):
        v = self._verdict(self._align(), rmse=0.2)
        assert not v.ok and "high_rmse" in v.reasons

    def test_box_mismatch_flagged(self):
        a = self._align()
        # a transform that moves comparison boxes 2 m off the gold boxes
        a.final_transform = np.eye(4, dtype=np.float32)
        a.final_transform[:3, 3] = [2.0, 0.0, 0.0]
        v = self._verdict(a)
        assert not v.ok and "box_mismatch" in v.reasons

    def test_planar_no_anchor_degenerate(self):
        a = self._align(with_boxes=False)
        v = self._verdict(a, comp_s=_plane_cloud(seed=5))
        assert not v.ok and "degenerate_geometry" in v.reasons
        assert v.planarity < 1e-4 and v.n_anchor_boxes == 0

    def test_planar_with_anchors_not_degenerate(self):
        """Planarity alone is NOT a failure — every wall scan is planar;
        only a planar scan with no semantic anchors is untrustworthy."""
        v = self._verdict(self._align(with_boxes=True),
                          comp_s=_plane_cloud(seed=6))
        assert v.ok


class TestComparisonFlagColumn:
    def test_rows_and_csv_carry_flag(self, tmp_path):
        cents = [(0.0, 0.0, 2.8)]
        boxes = _boxes(cents, [0])
        bad = {"ok": False, "reasons": ("low_overlap", "box_mismatch")}
        cmp_ = BBoxComparison(
            boxes, boxes, None,
            csv_output_file=str(tmp_path / "c.csv"),
            alignment_verdict=bad,
        )
        rows = cmp_.match_bboxes()
        assert all(r["alignment"] == "suspect:low_overlap|box_mismatch"
                   for r in rows)
        header = open(tmp_path / "c.csv").readline()
        assert "alignment" in header

    def test_none_verdict_keeps_schema(self, tmp_path):
        boxes = _boxes([(0.0, 0.0, 2.8)], [0])
        cmp_ = BBoxComparison(
            boxes, boxes, None, csv_output_file=str(tmp_path / "c.csv")
        )
        rows = cmp_.match_bboxes()
        assert all("alignment" not in r for r in rows)
        assert "alignment" not in open(tmp_path / "c.csv").readline()


class TestWatchQuarantine:
    def test_suspect_capture_quarantined(self, tmp_path, monkeypatch):
        import tpu3dlm.pipeline.task as task
        from tpu3dlm.pipeline.watch import (
            DONE_SENTINEL,
            SUSPECT_SENTINEL,
            ScanWatcher,
        )

        class _SuspectPipeline:
            stage_times = {"detect": 0.1}
            data_to_save = {
                "predictions": {0: []},
                "comparison_rows": [
                    {"status": "missing", "alignment": "suspect:low_overlap"}
                ],
                "alignment_verdict": {
                    "ok": False, "reasons": ["low_overlap"],
                    "rmse": 0.2, "inlier_frac": 0.1,
                },
            }

        def fake_setup(folder, cfg, cfg_goldstd=None, goldstd_var=None):
            os.makedirs(os.path.dirname(cfg.pickle_path), exist_ok=True)
            with open(cfg.pickle_path, "wb") as f:
                f.write(b"x")
            return _SuspectPipeline()

        monkeypatch.setattr(task, "setup_pipeline", fake_setup)
        monkeypatch.setattr(task, "load_gold_std", lambda p: {"stub": True})
        w = ScanWatcher(str(tmp_path / "variables.cfg"), poll_interval=0.01)
        os.makedirs(os.path.dirname(w.cfg_goldstd.pickle_path), exist_ok=True)
        with open(w.cfg_goldstd.pickle_path, "wb") as f:
            f.write(b"x")

        path = os.path.join(w.data_root, "scan_x")
        os.makedirs(os.path.join(path, "rtabmap_extract"), exist_ok=True)
        with open(os.path.join(path, "poses.txt"), "w") as f:
            f.write("1.0 0 0 0 0 0 0 1 1\n")
        w.run_once()
        w.run_once()
        assert "scan_x" in w.suspect
        assert os.path.exists(os.path.join(path, SUSPECT_SENTINEL))
        assert not os.path.exists(os.path.join(path, DONE_SENTINEL))
        rec = json.load(open(os.path.join(path, SUSPECT_SENTINEL)))
        assert rec["alignment_verdict"]["reasons"] == ["low_overlap"]
        # quarantined folders are never rediscovered
        assert w.run_once() == []


@pytest.mark.slow
class TestFailureScenes:
    """The three constructed failure modes through REAL registration."""

    def test_good_capture_passes_and_rows_unchanged(self):
        cents = [(-0.4, -0.15, 2.8), (0.55, -0.25, 2.85), (1.45, 0.3, 2.8)]
        gold_boxes = _boxes(cents, [0, 1, 0])
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.3, -0.2, 0.05]
        comp_cents = [np.asarray(c) + T[:3, 3] for c in cents]
        comp_boxes = _boxes(comp_cents, [0, 1, 0])
        base = np.concatenate([_plane_cloud(), np.asarray(cents, np.float32)
                               + np.zeros((1, 3), np.float32)])
        comp = base @ T[:3, :3].T + T[:3, 3]
        a = _mk_alignment(base, comp, gold_boxes, comp_boxes)
        a.compare("good")
        v = a.last_verdict
        assert v is not None and v.ok, v
        rows = BBoxComparison(
            gold_boxes, _boxes([np.asarray(c) for c in cents], [0, 1, 0]),
            None, csv_output_file="/tmp/_verdict_good.csv",
            alignment_verdict=v.to_dict(),
        ).match_bboxes()
        assert all(r["status"] == "matched" for r in rows)
        assert all(r["alignment"] == "ok" for r in rows)

    def test_partial_overlap_flagged(self):
        # gold is a wall patch; the capture shares ~30% of it and then
        # continues into a PERPENDICULAR corridor wall gold never saw —
        # after registration most query points have no gold counterpart,
        # so inlier_frac collapses. (A planar continuation would NOT
        # collapse inliers — plane slides on plane — which is exactly why
        # the verdict also carries the ambiguity/degeneracy signals.)
        rng = np.random.default_rng(2)
        base = np.concatenate([
            _plane_cloud(x0=0.0),
            _plane_cloud(n=800, w=0.5, h=0.5, seed=3, x0=1.0)
            + np.array([0, 0, -0.5], np.float32),
        ])
        overlap = _plane_cloud(n=1200, w=1.2, seed=4, x0=2.8)
        corridor = np.stack([
            np.full(2800, 4.0) + rng.normal(0, 0.001, 2800),
            rng.uniform(-1.25, 1.25, 2800),
            rng.uniform(3.0, 7.0, 2800),
        ], axis=1).astype(np.float32)
        comp = np.concatenate([overlap, corridor])
        # sign anchors in the shared patch, as every real capture has —
        # without anchors a wrong-but-plausible plane-onto-plane mapping
        # is geometrically unidentifiable (which is the design thesis of
        # the box-anchor term; see Alignment._box_residual)
        cents = [(3.0, -0.2, 2.8), (3.6, 0.3, 2.85)]
        boxes = _boxes(cents, [0, 1])
        a = _mk_alignment(base, comp, boxes, boxes)
        a.compare("partial")
        v = a.last_verdict
        assert not v.ok, v
        # flagged either because the true (partial) alignment has low
        # inliers, or because a higher-inlier wrong basin moved the
        # anchors off their gold counterparts
        assert "low_overlap" in v.reasons or "box_mismatch" in v.reasons, v

    def test_featureless_plane_flagged(self):
        a = _mk_alignment(_plane_cloud(), _plane_cloud(seed=7))
        a.compare("plane")
        v = a.last_verdict
        assert not v.ok and "degenerate_geometry" in v.reasons, v

    def test_out_of_basin_rotation_flagged(self):
        # capture world rotated 90° about z; centroid init cannot reach the
        # basin, and the aligned sign anchors land far from gold's
        cents = [(-0.4, -0.15, 2.8), (0.55, -0.25, 2.85), (1.45, 0.3, 2.8)]
        gold_boxes = _boxes(cents, [0, 1, 0])
        R = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        base = np.concatenate([
            _plane_cloud(),
            _plane_cloud(n=600, w=0.4, h=0.4, seed=8, x0=0.5)
            + np.array([0, 0, -0.4], np.float32),
        ])
        comp = base @ R.T
        comp_boxes = _boxes([R @ np.asarray(c) for c in cents], [0, 1, 0])
        a = _mk_alignment(base, comp, gold_boxes, comp_boxes,
                          global_init="centroid")
        a.compare("rot90")
        v = a.last_verdict
        assert not v.ok, v
        assert "box_mismatch" in v.reasons or "high_rmse" in v.reasons, v
