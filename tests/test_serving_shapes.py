"""Serving shape stability: varying capture sizes must neither retrace the
compiled programs nor change results.

A long-lived serving process (pipeline/watch.py) sees a different frame
count and box count per capture; each per-capture axis is bucket-padded
(utils/shapes) so XLA compiles one program per bucket. These tests pin
(a) bucket arithmetic, (b) exactness of the padding (padded entries can
never interact with real ones), and (c) zero recompiles across different
capture sizes inside one bucket — the property the whole scheme exists for.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from tpu3dlm.utils.shapes import next_bucket, pad_axis0

# whole-file slow tier: multi-capture serving pipelines (pyproject markers)
pytestmark = pytest.mark.slow


@pytest.fixture
def rng():
    return np.random.default_rng(7)


class TestBuckets:
    def test_pow2_below_quarter_from(self):
        assert next_bucket(1) == 8
        assert next_bucket(8) == 8
        assert next_bucket(9) == 16
        assert next_bucket(64) == 64

    def test_quarter_octave_above(self):
        # 100 → octave [64, 128] → steps 80, 96, 112, 128
        assert next_bucket(100) == 112
        assert next_bucket(80) == 80
        assert next_bucket(81) == 96
        assert next_bucket(128) == 128
        assert next_bucket(129) == 160

    def test_monotone_and_bounded(self):
        prev = 0
        for n in range(1, 3000):
            b = next_bucket(n)
            assert b >= n
            assert b >= prev  # monotone in n
            assert b <= 2 * n or b == 8  # never worse than pow2
            prev = b

    def test_pad_axis0(self):
        x = np.arange(6, dtype=np.float32).reshape(3, 2)
        p = pad_axis0(x, 5, fill=-1)
        assert p.shape == (5, 2)
        np.testing.assert_array_equal(p[:3], x)
        assert (p[3:] == -1).all()
        # no-op when already at size
        assert pad_axis0(x, 3).shape == (3, 2)


def _random_gboxes(rng, F, B, n_real):
    """GlobalBoxes with n_real valid planar quads scattered over (F, B)."""
    from tpu3dlm.mapper.projection import GlobalBoxes

    corners = rng.uniform(-2, 2, (F, B, 4, 3)).astype(np.float32)
    # make quads planar-ish and non-degenerate: base point + two edges
    base = rng.uniform(-2, 2, (F, B, 1, 3)).astype(np.float32)
    e1 = rng.uniform(0.2, 0.6, (F, B, 1, 3)).astype(np.float32)
    e2 = rng.uniform(0.2, 0.6, (F, B, 1, 3)).astype(np.float32)
    corners = np.concatenate([base, base + e1, base + e1 + e2, base + e2], axis=2)
    conf = rng.uniform(0.2, 0.9, (F, B)).astype(np.float32)
    mask = np.zeros((F, B), bool)
    flat = rng.choice(F * B, n_real, replace=False)
    mask.reshape(-1)[flat] = True
    return GlobalBoxes(
        corners=corners,
        damage=np.zeros((F, B), np.int32),
        conf=conf,
        label=np.zeros((F, B), np.int32),
        mask=mask,
    )


def _poses(rng, F):
    q = rng.normal(0, 1, (F, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return np.concatenate(
        [rng.uniform(-1, 1, (F, 3)), q], axis=1
    ).astype(np.float32)


class TestNMSPadding:
    def test_padded_mask_matches_unpadded_kernel(self, rng):
        """suppress_bboxes (bucket-padded) == raw nms3d_mask on exact shapes."""
        from tpu3dlm.mapper.nms3d import nms3d_mask, suppress_bboxes

        F, B = 11, 6  # buckets to 16
        gb = _random_gboxes(rng, F, B, 30)
        poses = _poses(rng, F)
        got = np.asarray(suppress_bboxes(gb, poses).mask)
        want = np.asarray(
            nms3d_mask(
                jnp.asarray(gb.corners),
                jnp.asarray(gb.conf),
                jnp.asarray(gb.mask),
                jnp.asarray(poses)[:, :3],
                iou_threshold=0.25,
                depth_buffer=0.03,
                area_min=0.001,
                cam_dist_min=0.01,
                top_k=1024,
            )
        )
        np.testing.assert_array_equal(got, want)
        assert got.shape == (F, B)

    def test_no_recompile_across_frame_counts(self, rng):
        from tpu3dlm.mapper import nms3d
        from tpu3dlm.mapper.nms3d import suppress_bboxes

        for F in (9, 12):  # warm the 16-bucket
            suppress_bboxes(_random_gboxes(rng, F, 4, 10), _poses(rng, F))
        before = nms3d.nms3d_mask._cache_size()
        for F in (10, 14, 16):
            out = suppress_bboxes(_random_gboxes(rng, F, 4, 10), _poses(rng, F))
            assert np.asarray(out.mask).shape == (F, 4)
        assert nms3d.nms3d_mask._cache_size() == before


class TestProjectionPadding:
    def _scan_det(self, rng, F, B=4):
        from tpu3dlm.data.scan import Detections, Scan

        depth = rng.uniform(500, 3000, (F, 48, 64)).astype(np.float32)
        scan = Scan(
            rgb=np.zeros((F, 8, 8, 3), np.uint8),
            depth=depth,
            intrinsics=np.tile(
                np.asarray([[60.0, 60.0, 32.0, 24.0]], np.float32), (F, 1)
            ),
            rgb_size=np.tile(np.asarray([[64, 48]], np.float32), (F, 1)),
            poses=_poses(rng, F),
        )
        boxes = np.stack(
            [
                rng.uniform(2, 20, (F, B)),
                rng.uniform(2, 14, (F, B)),
                rng.uniform(30, 60, (F, B)),
                rng.uniform(20, 44, (F, B)),
            ],
            axis=-1,
        ).astype(np.float32)
        mask = rng.uniform(size=(F, B)) < 0.7
        det = Detections(
            boxes=boxes,
            conf=np.full((F, B), 0.9, np.float32),
            label=np.zeros((F, B), np.int32),
            damage=np.zeros((F, B), np.int32),
            mask=mask,
        )
        return scan, det

    def test_padded_matches_exact_shape_kernel(self, rng):
        from tpu3dlm.mapper.projection import project_boxes, project_detections

        F = 11
        scan, det = self._scan_det(rng, F)
        gb = project_detections(scan, det)
        corners, mask = project_boxes(
            # median_samples=16 matches project_detections' serving default
            # (the raw kernel's library default is 32)
            jnp.asarray(det.boxes),
            jnp.asarray(det.mask),
            jnp.asarray(scan.depth),
            jnp.asarray(scan.intrinsics),
            jnp.asarray(scan.rgb_size),
            jnp.asarray(scan.poses),
            median_samples=16,
        )
        np.testing.assert_allclose(
            np.asarray(gb.corners), np.asarray(corners), atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(gb.mask), np.asarray(mask))

    def test_no_recompile_across_frame_counts(self, rng):
        from tpu3dlm.mapper import projection
        from tpu3dlm.mapper.projection import project_detections

        project_detections(*self._scan_det(rng, 9))
        before = projection.project_boxes._cache_size()
        for F in (10, 13, 16):
            out = project_detections(*self._scan_det(rng, F))
            assert np.asarray(out.mask).shape[0] == F
        assert projection.project_boxes._cache_size() == before


class TestComparisonPadding:
    def _records(self, rng, centers, labels, damage=None):
        boxes = {}
        for i, (c, l) in enumerate(zip(centers, labels)):
            quad = c[None] + np.asarray(
                [[0, 0, 0], [0.2, 0, 0], [0.2, 0.2, 0], [0, 0.2, 0]], np.float32
            )
            d = 0 if damage is None else damage[i]
            boxes.setdefault(i % 3, []).append(
                [quad[0], quad[1], quad[2], quad[3], d, 0.9, int(l)]
            )
        return boxes

    def test_match_unchanged_by_bucket_padding(self, rng, tmp_path):
        """17 vs 19 boxes (pads to 32×32) must match exactly like the
        direct unpadded auction."""
        from tpu3dlm.alignment.comparison import BBoxComparison
        from tpu3dlm.ops.matching import auction_assign

        base_c = rng.uniform(-3, 3, (17, 3)).astype(np.float32)
        # comp = base shuffled + jitter, 2 dropped, 4 new
        perm = rng.permutation(17)[:15]
        comp_c = np.concatenate(
            [
                base_c[perm] + rng.normal(0, 0.02, (15, 3)).astype(np.float32),
                rng.uniform(5, 8, (4, 3)).astype(np.float32),
            ]
        )
        labels_b = rng.integers(0, 3, 17)
        labels_c = np.concatenate([labels_b[perm], rng.integers(0, 3, 4)])

        cmp_ = BBoxComparison(
            self._records(rng, base_c, labels_b),
            self._records(rng, comp_c, labels_c),
            csv_output_file=str(tmp_path / "cmp.csv"),
        )
        rows = cmp_.match_bboxes()

        # direct unpadded solve on the same cost for ground truth
        base_rec_c = cmp_._centroids(cmp_.base_records)
        comp_rec_c = cmp_._centroids(cmp_.comparison_records)
        lb = np.array([r["label"] for r in cmp_.base_records])
        lc = np.array([r["label"] for r in cmp_.comparison_records])
        dist = np.linalg.norm(
            base_rec_c[:, None, :] - comp_rec_c[None, :, :], axis=-1
        )
        cost = np.where(lb[:, None] == lc[None, :], dist, np.inf).astype(
            np.float32
        )
        a, m = auction_assign(jnp.asarray(cost), unmatch_cost=0.5)
        want = np.where(np.asarray(m), np.asarray(a), -1)

        got = np.full(17, -1, np.int64)
        for r in rows:
            if r["base_id"] >= 0 and r["comparison_id"] >= 0:
                got[r["base_id"]] = r["comparison_id"]
        np.testing.assert_array_equal(got, want)
        # sanity on the report semantics
        n_missing = sum(1 for r in rows if r["status"] == "missing")
        n_new = sum(1 for r in rows if r["status"] == "new")
        assert n_missing == int((want < 0).sum())
        assert n_new == 19 - int((want >= 0).sum())

    def test_no_recompile_across_box_counts(self, rng, tmp_path):
        from tpu3dlm.alignment.comparison import BBoxComparison
        from tpu3dlm.ops import matching

        def run(nb, nc, tag):
            b = rng.uniform(-3, 3, (nb, 3)).astype(np.float32)
            c = rng.uniform(-3, 3, (nc, 3)).astype(np.float32)
            BBoxComparison(
                self._records(rng, b, np.zeros(nb, int)),
                self._records(rng, c, np.zeros(nc, int)),
                csv_output_file=str(tmp_path / f"{tag}.csv"),
            ).match_bboxes()

        run(9, 11, "warm")  # warms the 16×16 bucket
        before = matching.auction_assign._cache_size()
        run(12, 16, "a")
        run(16, 10, "b")
        assert matching.auction_assign._cache_size() == before


class TestServingNoRetrace:
    """The serving guarantee end-to-end: two captures of DIFFERENT sizes
    (frame count, box count, cloud density) through the full two-scan
    pipeline in one process must not compile a single new stage program
    once the first capture pair has warmed the buckets."""

    def test_full_pipeline_no_retrace_across_capture_sizes(self, tmp_path):
        import os

        from tpu3dlm.alignment import align as align_mod  # noqa: F401
        from tpu3dlm.mapper import nms3d, projection
        from tpu3dlm.ops import icp as icp_mod
        from tpu3dlm.ops import matching
        from tpu3dlm.pipeline.evaluate import make_project
        from tpu3dlm.pipeline.task import load_gold_std, setup_pipeline
        from tpu3dlm.utils.config import ConfigLoader

        fixtures = os.path.join(os.path.dirname(__file__), "fixtures")
        yolo = os.path.join(fixtures, "yolo_synthetic.msgpack")
        beit = os.path.join(fixtures, "beit_synthetic.msgpack")

        def run(root, num_frames, points_per_m2):
            cfg_path, _, _, _ = make_project(
                str(root), yolo, beit,
                num_frames=num_frames, cloud_points_per_m2=points_per_m2,
                # CI-speed ICP budget (same knobs as test_e2e_accuracy —
                # the accuracy asserts still hold at this scale)
                extra_cfg=[
                    ("icp_max_points = 16384", "icp_max_points = 4096"),
                    ("icp_iterations = 30", "icp_iterations = 10"),
                ],
            )
            cfg_gold = ConfigLoader(cfg_path, "gold_std")
            cfg_maint = ConfigLoader(cfg_path, "maintenance")
            setup_pipeline("gold_std", cfg_gold, None)
            gold_var = load_gold_std(cfg_gold.pickle_path)
            p2 = setup_pipeline("maintenance", cfg_maint, cfg_gold, gold_var)
            rows = p2.data_to_save["comparison_rows"]
            assert sum(1 for r in rows if r["status"] == "missing") == 1

        run(tmp_path / "a", num_frames=5, points_per_m2=1200)

        tracked = {
            "project_boxes": projection.project_boxes,
            "nms3d_mask": nms3d.nms3d_mask,
            "auction_assign": matching.auction_assign,
            "icp": icp_mod.icp,
            "icp_point_to_plane": icp_mod.icp_point_to_plane,
            "init_residuals_batched": icp_mod.init_residuals_batched,
            # the round-4 single-dispatch compare program: per-capture box
            # counts / cloud sizes must all land in the warmed buckets
            "fused_compare": align_mod._fused_compare_program,
        }
        before = {k: f._cache_size() for k, f in tracked.items()}

        # different frame count AND cloud density AND (via seed-1 jitter)
        # different detection counts — all inside the warmed buckets
        run(tmp_path / "b", num_frames=7, points_per_m2=1100)

        after = {k: f._cache_size() for k, f in tracked.items()}
        retraced = {k: (before[k], after[k]) for k in tracked if after[k] > before[k]}
        assert not retraced, f"stage programs retraced on capture B: {retraced}"


class TestTSDFBucketing:
    def _scan(self, rng, F, hd=24, wd=32):
        from tpu3dlm.data.scan import Scan

        depth = np.full((F, hd, wd), 2000.0, np.float32)  # flat wall at 2 m
        poses = np.zeros((F, 7), np.float32)
        poses[:, 6] = 1.0
        poses[:, 0] = 0.01 * np.arange(F)
        return Scan(
            rgb=np.zeros((F, 8, 8, 3), np.uint8),
            depth=depth,
            intrinsics=np.tile(
                np.asarray([[40.0, 40.0, 16.0, 12.0]], np.float32), (F, 1)
            ),
            rgb_size=np.tile(np.asarray([[wd, hd]], np.float32), (F, 1)),
            poses=poses,
        )

    def test_no_recompile_across_scan_shapes(self, rng):
        """TSDF fusion must reuse one program across frame counts and grid
        sizes inside the buckets (its jit used to be a per-call closure)."""
        from tpu3dlm.mapper import meshing

        bounds = (np.asarray([-1.0, -1.0, 1.0]), np.asarray([1.0, 1.0, 2.4]))
        meshing.tsdf_from_scan(self._scan(rng, 5), voxel=0.1, bounds=bounds)
        before = meshing._fuse_tsdf._cache_size()
        # different frame counts within one fine bucket (9 and 10 both
        # bucket to 10)
        meshing.tsdf_from_scan(self._scan(rng, 9), voxel=0.1, bounds=bounds)
        b9 = meshing._fuse_tsdf._cache_size()
        meshing.tsdf_from_scan(self._scan(rng, 10), voxel=0.1, bounds=bounds)
        # slightly different grid extents inside the same voxel bucket
        # (f32 dim math: 21·21·16=7056 and 20·21·16=6720 both bucket to
        # 7168), and a different truncation distance (traced, not baked)
        bounds2 = (np.asarray([-1.0, -1.0, 1.0]), np.asarray([0.95, 1.0, 2.4]))
        meshing.tsdf_from_scan(
            self._scan(rng, 10), voxel=0.1, trunc=0.45, bounds=bounds2
        )
        assert meshing._fuse_tsdf._cache_size() == b9

    def test_field_values_sane_under_padding(self, rng):
        """Padded voxels/frames must not leak into the field: a flat wall at
        2 m yields sdf≈0 near the wall plane and NaN (unobserved) behind."""
        from tpu3dlm.mapper import meshing

        bounds = (np.asarray([-0.5, -0.5, 1.6]), np.asarray([0.5, 0.5, 2.4]))
        field, origin, voxel = meshing.tsdf_from_scan(
            self._scan(rng, 5), voxel=0.1, bounds=bounds
        )
        # wall plane z=2.0 → k index ≈ (2.0-1.6)/0.1 = 4
        near_wall = field[:, :, 4]
        ok = np.isfinite(near_wall)
        assert ok.any()
        assert np.abs(near_wall[ok]).max() < 0.5
        # well in front of the wall: observed free space → +1
        front = field[field.shape[0] // 2, field.shape[1] // 2, 0]
        assert np.isfinite(front) and front > 0.9
