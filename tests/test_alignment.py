"""L4 alignment + comparison tests against the synthetic scene's closed-form
ground truth: a maintenance scan generated in a rigidly shifted world frame
with one sign removed must align back onto the gold standard and report the
removed sign as missing (reference behavior, README.md:59-73)."""

import os

import numpy as np
import pytest

from tpu3dlm.alignment import Alignment, BBoxComparison
from tpu3dlm.alignment.visualise import VisualiseAlignment
from tpu3dlm.data import synthetic
from tpu3dlm.data.ply import load_ply

# whole-file slow tier: full-scale ICP registration legs (pyproject markers)
pytestmark = pytest.mark.slow


def _world_T(angle=0.12, t=(0.8, -0.5, 0.3)):
    c, s = np.cos(angle), np.sin(angle)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    T[:3, 3] = t
    return T


def _boxes_from_signs(signs, T=None, damage_override=None):
    out = {0: []}
    for k, s in enumerate(signs):
        corners = s.corners_world
        if T is not None:
            corners = corners @ T[:3, :3].T + T[:3, 3]
        dmg = s.damage if damage_override is None else damage_override.get(k, s.damage)
        out[0].append([corners[i] for i in range(4)] + [dmg, 0.9, s.label])
    return out


@pytest.fixture(scope="module")
def scans(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scans"))
    Tw = _world_T()
    gold = synthetic.generate_scan(root, "gold_std", num_frames=4, seed=0, cloud_points_per_m2=1500)
    maint = synthetic.generate_scan(
        root, "maintenance", num_frames=4, seed=1,
        world_transform=Tw, drop_sign_indices=(1,), cloud_points_per_m2=1500,
    )
    gold_cloud, _ = load_ply(os.path.join(root, "gold_std", "cloud.ply"))
    maint_cloud, _ = load_ply(os.path.join(root, "maintenance", "cloud.ply"))
    return root, Tw, gold, maint, gold_cloud, maint_cloud


class TestAlignment:
    def test_recovers_world_transform(self, scans):
        root, Tw, gold, maint, gold_cloud, maint_cloud = scans
        base_boxes = _boxes_from_signs(gold.signs)
        comp_boxes = _boxes_from_signs(maint.signs, T=Tw)

        align = Alignment(
            base_pose_df=gold.poses,
            comparison_pose_df=maint.poses,
            base_bboxes=base_boxes,
            comparison_bboxes=comp_boxes,
            base_cloud=gold_cloud,
            comparison_cloud=maint_cloud,
            max_points=4096,
            icp_iterations=40,
        )
        aligned, transforms, base_map, comp_map = align.compare("maintenance")

        # final transform ≈ Tw⁻¹
        want = np.linalg.inv(Tw)
        np.testing.assert_allclose(align.final_transform, want, atol=0.05)

        # aligned maintenance boxes land on the gold-world sign corners
        for row, sign in zip(aligned[0], maint.signs):
            got = np.stack(row[:4])
            np.testing.assert_allclose(got, sign.corners_world, atol=0.08)

    def test_transform_record_contract(self, scans):
        root, Tw, gold, maint, gold_cloud, maint_cloud = scans
        align = Alignment(
            gold.poses, maint.poses,
            _boxes_from_signs(gold.signs), _boxes_from_signs(maint.signs, T=Tw),
            base_cloud=gold_cloud, comparison_cloud=maint_cloud,
            max_points=2048, icp_iterations=10, max_correspondence_dist=1.0,
        )
        _, transforms, _, _ = align.compare()
        assert len(transforms) == 1 + 10  # centroid + per-iteration increments
        first = transforms[0]
        assert first.shape == (4, 4)
        np.testing.assert_allclose(first[:3, :3], np.eye(3), atol=1e-6)  # pure translation
        # centroid init followed by the increments composes to the final T
        comp = np.eye(4)
        for t in transforms:
            comp = t @ comp
        np.testing.assert_allclose(comp, align.final_transform, atol=1e-4)

    def test_concurrent_compare_shares_gold_cache(self, scans):
        """Serving concurrency: two captures registering against the SAME
        gold cloud from worker threads (pipeline/watch.py concurrency > 1)
        must reproduce the serial result exactly and share one gold-side
        cache entry (alignment/align._CACHE_LOCK guards the LRUs)."""
        from concurrent.futures import ThreadPoolExecutor

        from tpu3dlm.alignment import align as align_mod

        root, Tw, gold, maint, gold_cloud, maint_cloud = scans

        def make():
            return Alignment(
                gold.poses, maint.poses,
                _boxes_from_signs(gold.signs),
                _boxes_from_signs(maint.signs, T=Tw),
                base_cloud=gold_cloud, comparison_cloud=maint_cloud,
                max_points=2048, icp_iterations=10,
                max_correspondence_dist=1.0,
            )

        align_mod._GOLD_CACHE.clear()
        serial = make()
        serial.compare()
        baseline = serial.final_transform
        n_entries = len(align_mod._GOLD_CACHE)

        aligns = [make() for _ in range(2)]
        with ThreadPoolExecutor(2) as pool:
            list(pool.map(lambda a: a.compare(), aligns))
        for a in aligns:
            np.testing.assert_allclose(a.final_transform, baseline, atol=1e-6)
        assert len(align_mod._GOLD_CACHE) == n_entries  # shared, not rebuilt


class TestGlobalInit:
    def test_recovers_large_rotation(self, tmp_path_factory):
        """A maintenance scan captured facing ~155° the other way is far
        outside any ICP basin from a centroid init; the auto principal-axes
        init must still recover the world transform."""
        root = str(tmp_path_factory.mktemp("rot_scans"))
        Tw = _world_T(angle=2.7, t=(1.0, -0.8, 0.2))
        gold = synthetic.generate_scan(root, "gold_std", num_frames=4, seed=0, cloud_points_per_m2=1500)
        maint = synthetic.generate_scan(
            root, "maintenance", num_frames=4, seed=1, world_transform=Tw,
            cloud_points_per_m2=1500,
        )
        gold_cloud, _ = load_ply(os.path.join(root, "gold_std", "cloud.ply"))
        maint_cloud, _ = load_ply(os.path.join(root, "maintenance", "cloud.ply"))
        align = Alignment(
            gold.poses, maint.poses,
            _boxes_from_signs(gold.signs), _boxes_from_signs(maint.signs, T=Tw),
            base_cloud=gold_cloud, comparison_cloud=maint_cloud,
            max_points=4096, icp_iterations=40,
        )
        aligned, transforms, _, _ = align.compare("maintenance")
        np.testing.assert_allclose(
            align.final_transform, np.linalg.inv(Tw), atol=0.05
        )

        # animation contract: translation 4×4, then an (R, center) rotation
        # tuple, then per-iteration 4×4 increments — and they compose to the
        # final transform
        assert transforms[0].shape == (4, 4)
        np.testing.assert_allclose(transforms[0][:3, :3], np.eye(3), atol=1e-6)
        assert isinstance(transforms[1], tuple)
        comp = np.eye(4)
        for t in transforms:
            if isinstance(t, tuple):
                R, c = t
                M = np.eye(4, dtype=np.float64)
                M[:3, :3] = R
                M[:3, 3] = c - R @ c
                t = M
            comp = t @ comp
        np.testing.assert_allclose(comp, align.final_transform, atol=1e-4)

    def test_symmetric_scene_translation_not_mistaken_for_flip(
        self, tmp_path_factory
    ):
        """Regression: the wall cloud is nearly 180°-flip symmetric, and with
        a sign dropped the flipped PCA candidate once out-scored the centroid
        init on cloud geometry alone — ICP then converged into the flipped
        basin with near-perfect rmse. The labeled box anchors in the init
        score must keep the translation-only solution."""
        root = str(tmp_path_factory.mktemp("sym_scans"))
        Tw = np.eye(4, dtype=np.float32)
        Tw[:3, 3] = (0.4, -0.3, 0.1)
        gold = synthetic.generate_scan(root, "gold_std", num_frames=4, seed=0, cloud_points_per_m2=1500)
        maint = synthetic.generate_scan(
            root, "maintenance", num_frames=4, seed=1,
            world_transform=Tw, drop_sign_indices=(2,), cloud_points_per_m2=1500,
        )
        gold_cloud, _ = load_ply(os.path.join(root, "gold_std", "cloud.ply"))
        maint_cloud, _ = load_ply(os.path.join(root, "maintenance", "cloud.ply"))
        kept = [s for i, s in enumerate(maint.signs)]
        align = Alignment(
            gold.poses, maint.poses,
            _boxes_from_signs(gold.signs),
            _boxes_from_signs(kept, T=Tw),
            base_cloud=gold_cloud, comparison_cloud=maint_cloud,
            max_points=4096, icp_iterations=30,
        )
        align.compare("maintenance")
        np.testing.assert_allclose(
            align.final_transform, np.linalg.inv(Tw), atol=0.05
        )

    def test_empty_map_fails_loudly(self, scans):
        """A comparison capture with NO registration geometry must fail
        with a clear message, not a bare ZeroDivisionError from the
        subsample tiler."""
        root, Tw, gold, maint, gold_cloud, maint_cloud = scans
        align = Alignment(
            gold.poses, np.zeros((0, 7), np.float32), {0: []}, {0: []},
            base_cloud=gold_cloud, comparison_cloud=np.zeros((0, 3), np.float32),
            max_points=1024, icp_iterations=2,
        )
        with pytest.raises(ValueError, match="empty point set"):
            align.compare("maintenance")

    def test_empty_base_cloud_keeps_point_to_point(self, scans, monkeypatch):
        """An EMPTY (but non-None) base_cloud falls back to pose+corner
        registration geometry, whose 'normals' are meaningless — the
        point-to-plane path (and its normal estimation) must not run."""
        import tpu3dlm.ops.pointcloud as pc

        root, Tw, gold, maint, gold_cloud, maint_cloud = scans

        def boom(*a, **k):
            raise AssertionError("estimate_normals_grid must not run on the "
                                 "sparse fallback geometry")

        monkeypatch.setattr(pc, "estimate_normals_grid", boom)
        base_boxes = _boxes_from_signs(gold.signs)
        comp_boxes = _boxes_from_signs(maint.signs, T=Tw)
        align = Alignment(
            gold.poses, maint.poses, base_boxes, comp_boxes,
            base_cloud=np.zeros((0, 3), np.float32),
            comparison_cloud=np.zeros((0, 3), np.float32),
            max_points=1024, icp_iterations=5,
        )
        align.compare("maintenance")  # must not trip the boom

    def test_auto_keeps_centroid_when_unrotated(self, scans):
        """auto must not inject a rotation step on an in-basin scan — the
        recorded-transform contract of the default path stays intact."""
        root, Tw, gold, maint, gold_cloud, maint_cloud = scans
        align = Alignment(
            gold.poses, maint.poses,
            _boxes_from_signs(gold.signs), _boxes_from_signs(maint.signs, T=Tw),
            base_cloud=gold_cloud, comparison_cloud=maint_cloud,
            max_points=2048, icp_iterations=10, max_correspondence_dist=1.0,
        )
        _, transforms, _, _ = align.compare()
        assert len(transforms) == 1 + 10
        assert not any(isinstance(t, tuple) for t in transforms)


class TestBBoxComparison:
    def test_missing_and_damaged_flagged(self, scans, tmp_path):
        root, Tw, gold, maint, gold_cloud, maint_cloud = scans
        base_boxes = _boxes_from_signs(gold.signs)
        # perfectly aligned maintenance boxes (drop sign index 1 of gold,
        # change damage of the first remaining sign)
        aligned = _boxes_from_signs(maint.signs, damage_override={0: 1})
        csv_path = str(tmp_path / "report.csv")
        cmp = BBoxComparison(
            base_boxes, aligned, None, csv_output_file=csv_path, dist_threshold=0.4,
            id2damage={0: "undamaged", 1: "damaged"},
        )
        rows = cmp.match_bboxes()
        status = {r["base_id"]: r["status"] for r in rows if r["base_id"] >= 0}
        # gold sign 1 (dropped in maintenance) is missing
        assert status[1] == "missing"
        # gold sign 0: damage flipped 0 → 1
        assert status[0] == "damaged"
        # gold sign 2 matched clean
        assert status[2] == "matched"
        assert os.path.exists(csv_path)
        with open(csv_path) as f:
            header = f.readline().strip().split(",")
        assert "status" in header

    def test_new_object_flagged(self):
        base = {0: []}
        quad = [np.array([i * 0.1, 0, 3], np.float32) for i in range(4)]
        comp = {0: [quad + [0, 0.9, 2]]}
        rows = BBoxComparison(
            base, comp, None, csv_output_file="/tmp/_cmp_new.csv"
        ).match_bboxes()
        assert any(r["status"] == "new" for r in rows)

    def test_empty_both(self, tmp_path):
        rows = BBoxComparison(
            {0: []}, {0: []}, None, csv_output_file=str(tmp_path / "e.csv")
        ).match_bboxes()
        assert rows == []

    def test_no_label_overlap_all_missing_and_new(self, tmp_path):
        """Zero label overlap → every pair forbidden: every gold box must
        come out missing and every maintenance box new. Regression: the
        bucket-padded all-inf cost let real rows settle on PADDED columns,
        and indexing comparison_records with a padded j crashed the
        pipeline (IndexError) where pre-padding it merely mismatched."""
        quad_a = [np.array([i * 0.1, 0.0, 3.0], np.float32) for i in range(4)]
        quad_b = [np.array([i * 0.1, 1.0, 3.0], np.float32) for i in range(4)]
        # box row = 4 corners + [damage, conf, label]
        base = {0: [quad_a + [0, 0.9, 0], quad_b + [0, 0.9, 0]]}
        comp = {0: [quad_a + [0, 0.9, 1]]}  # same spot, different label
        rows = BBoxComparison(
            base, comp, None, csv_output_file=str(tmp_path / "nl.csv")
        ).match_bboxes()
        statuses = [r["status"] for r in rows]
        assert statuses.count("missing") == 2
        assert statuses.count("new") == 1
        assert not any(s in ("matched", "damaged") for s in statuses)


class TestVisualiseAlignment:
    def test_frames_rendered(self, scans, tmp_path):
        root, Tw, gold, maint, gold_cloud, maint_cloud = scans
        vis = VisualiseAlignment(gold_cloud, maint_cloud, image_hw=(64, 96), max_points=2000)
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.5, 0, 0]
        c, s = np.cos(0.3), np.sin(0.3)
        Rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        n = vis.create_video([T, (Rz, np.zeros(3, np.float32))],
                             output_video=str(tmp_path / "a.mp4"), steps=5)
        assert n == 10
        assert vis.frames[0].shape == (64, 96, 3)
        # something was drawn
        assert (vis.frames[0] < 255).any()

    def test_identity_tail_skipped(self, scans, tmp_path):
        """ICP's convergence early-stop pads the record with identity
        increments — the animation must not replay frozen frames."""
        root, Tw, gold, maint, gold_cloud, maint_cloud = scans
        vis = VisualiseAlignment(gold_cloud, maint_cloud, image_hw=(64, 96), max_points=2000)
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.5, 0, 0]
        record = [T] + [np.eye(4, dtype=np.float32)] * 20
        n = vis.create_video(record, output_video=str(tmp_path / "b.mp4"), steps=5)
        assert n == 5  # only the moving step is replayed

        # an all-identity record still yields one (static) step
        vis2 = VisualiseAlignment(gold_cloud, maint_cloud, image_hw=(64, 96), max_points=2000)
        n2 = vis2.create_video([np.eye(4, dtype=np.float32)] * 3,
                               output_video=str(tmp_path / "c.mp4"), steps=5)
        assert n2 == 5

    def test_empty_record_skips_video(self, scans, tmp_path):
        """A resume that skipped alignment leaves an empty transform record;
        the visualiser must warn and return 0 frames, not crash in the
        writer / np.stack far from the cause."""
        root, Tw, gold, maint, gold_cloud, maint_cloud = scans
        vis = VisualiseAlignment(gold_cloud, maint_cloud, image_hw=(64, 96), max_points=2000)
        out = tmp_path / "d.mp4"
        n = vis.create_video([], output_video=str(out), steps=5)
        assert n == 0
        assert vis.frames == []
        assert not out.exists()

    def test_poisson_mesher_renders(self, scans, tmp_path):
        """mesher="poisson" (cfg `mesher` knob) meshes both maps with the
        FFT Poisson reconstructor and still renders the orbit."""
        root, Tw, gold, maint, gold_cloud, maint_cloud = scans
        vis = VisualiseAlignment(gold_cloud, maint_cloud, image_hw=(64, 96),
                                 max_points=2000, mesher="poisson")
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.5, 0, 0]
        n = vis.create_video([T], output_video=str(tmp_path / "p.mp4"), steps=3)
        assert n == 3
        assert vis.uses_mesh
        assert (vis.frames[0] < 255).any()


class TestShardedAlignment:
    def test_mesh_sharded_compare_matches_unsharded(self, scans):
        """Alignment with a query-sharded 8-device mesh (parallel/nn) must
        recover the same transform as the single-device solve — including
        through the bucket-padded target (ops/icp.pad_target_bucket)."""
        import jax

        from tpu3dlm.parallel.mesh import make_mesh

        root, Tw, gold, maint, gold_cloud, maint_cloud = scans
        kwargs = dict(
            base_pose_df=gold.poses,
            comparison_pose_df=maint.poses,
            base_bboxes=_boxes_from_signs(gold.signs),
            comparison_bboxes=_boxes_from_signs(maint.signs, T=Tw),
            base_cloud=gold_cloud,
            comparison_cloud=maint_cloud,
            max_points=2048,
            icp_iterations=15,
        )
        assert jax.device_count() >= 8
        plain = Alignment(**kwargs)
        plain.compare()
        sharded = Alignment(mesh=make_mesh(8), **kwargs)
        sharded.compare()
        want = np.linalg.inv(Tw)
        # loose vs ground truth (15 CI-budget iterations leave a few degrees
        # of residual — full convergence is test_recovers_world_transform's
        # job); TIGHT vs the unsharded solve: query sharding picks identical
        # correspondences (argmin over the full target per query), so the
        # only divergence is f32 reduction order in the per-iteration solves
        np.testing.assert_allclose(sharded.final_transform, want, atol=0.15)
        np.testing.assert_allclose(
            sharded.final_transform, plain.final_transform, atol=1e-2
        )

    def test_mesh_sharded_with_ann_index(self, scans):
        """icp_ann=on under a query-sharded mesh: the anchor-bucketed
        iteration NN (ops/ann.py) must compose with sharded queries and
        land the same basin as the exact-sweep mesh solve. (At this test's
        cloud size "auto" keeps ANN off, so "on" is the only way to
        exercise the combination the config space allows.)"""
        import jax

        from tpu3dlm.parallel.mesh import make_mesh

        root, Tw, gold, maint, gold_cloud, maint_cloud = scans
        kwargs = dict(
            base_pose_df=gold.poses,
            comparison_pose_df=maint.poses,
            base_bboxes=_boxes_from_signs(gold.signs),
            comparison_bboxes=_boxes_from_signs(maint.signs, T=Tw),
            base_cloud=gold_cloud,
            comparison_cloud=maint_cloud,
            max_points=2048,
            icp_iterations=15,
        )
        assert jax.device_count() >= 8
        sharded_ann = Alignment(mesh=make_mesh(8), ann="on", **kwargs)
        sharded_ann.compare()
        want = np.linalg.inv(Tw)
        # ANN picks may differ from exact picks on near-ties, so compare
        # against ground truth at the unsharded test's tolerance rather
        # than bit-tight against the exact-sweep solve
        np.testing.assert_allclose(sharded_ann.final_transform, want, atol=0.15)


class TestAnnIndexCache:
    def test_content_keyed_hit_and_distinct_clouds(self, scans):
        """The cross-capture AnchorIndex cache must HIT for a re-registered
        identical gold cloud and MISS for a different cloud of the same
        size (content fingerprint, not shape)."""
        from tpu3dlm.alignment import align as align_mod

        root, Tw, gold, maint, gold_cloud, maint_cloud = scans
        kwargs = dict(
            base_pose_df=gold.poses,
            comparison_pose_df=maint.poses,
            base_bboxes=_boxes_from_signs(gold.signs),
            comparison_bboxes=_boxes_from_signs(maint.signs, T=Tw),
            base_cloud=gold_cloud,
            comparison_cloud=maint_cloud,
            max_points=2048,
            icp_iterations=4,
        )
        align_mod._ANN_INDEX_CACHE.clear()
        Alignment(ann="on", **kwargs).compare()
        n_first = len(align_mod._ANN_INDEX_CACHE)
        assert n_first >= 1  # ann=on built at least the full-target index
        entries = list(align_mod._ANN_INDEX_CACHE.values())
        # identical gold cloud through a FRESH instance: no new entries
        Alignment(ann="on", **kwargs).compare()
        assert len(align_mod._ANN_INDEX_CACHE) == n_first
        assert list(align_mod._ANN_INDEX_CACHE.values()) == entries
        # same-size but different cloud: new entries, old preserved
        kwargs2 = dict(kwargs)
        kwargs2["base_cloud"] = gold_cloud + np.float32(0.05)
        Alignment(ann="on", **kwargs2).compare()
        assert len(align_mod._ANN_INDEX_CACHE) > n_first
        align_mod._ANN_INDEX_CACHE.clear()


class TestGoldTargetCache:
    def test_placements_reused_across_captures(self, scans, monkeypatch):
        """The gold-target device placements (normals, padded target, init
        subsample) must be built ONCE per gold cloud and reused by every
        subsequent capture's fresh Alignment — and rebuilt when the gold
        cloud's content changes anywhere (fingerprint moment guard)."""
        from tpu3dlm.alignment import align as align_mod
        from tpu3dlm.ops import pointcloud as pc

        calls = {"normals": 0}
        real = pc.estimate_normals_grid

        def counting(*a, **k):
            calls["normals"] += 1
            return real(*a, **k)

        monkeypatch.setattr(pc, "estimate_normals_grid", counting)

        root, Tw, gold, maint, gold_cloud, maint_cloud = scans
        kwargs = dict(
            base_pose_df=gold.poses,
            comparison_pose_df=maint.poses,
            base_bboxes=_boxes_from_signs(gold.signs),
            comparison_bboxes=_boxes_from_signs(maint.signs, T=Tw),
            base_cloud=gold_cloud,
            comparison_cloud=maint_cloud,
            max_points=2048,
            icp_iterations=4,
        )
        align_mod._GOLD_CACHE.clear()
        a1 = Alignment(**kwargs)
        a1.compare()
        assert len(align_mod._GOLD_CACHE) == 1
        assert calls["normals"] == 1
        entry = next(iter(align_mod._GOLD_CACHE.values()))
        placed_full = entry["full"][0]

        # identical gold through a FRESH instance: same device arrays, no
        # new normals estimation, bit-identical registration
        a2 = Alignment(**kwargs)
        a2.compare()
        assert len(align_mod._GOLD_CACHE) == 1
        assert next(iter(align_mod._GOLD_CACHE.values()))["full"][0] is placed_full
        assert calls["normals"] == 1
        np.testing.assert_array_equal(a1.final_transform, a2.final_transform)

        # a single-coordinate edit anywhere in the gold cloud must miss
        edited = gold_cloud.copy()
        edited[len(edited) // 2, 1] += np.float32(0.25)
        kwargs2 = dict(kwargs, base_cloud=edited)
        Alignment(**kwargs2).compare()
        assert len(align_mod._GOLD_CACHE) == 2
        assert calls["normals"] == 2
        align_mod._GOLD_CACHE.clear()
