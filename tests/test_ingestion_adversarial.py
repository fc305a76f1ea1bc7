"""Adversarial ingestion corpus (VERDICT r2 item 8): realistic RTAB-Map
export variance the synthetic generator never produces, with the intended
behavior pinned for every case — the zero-egress proxy for validating
against a genuine capture.

Cases and their pinned behavior:

* mixed CV_8UC4 / 16UC1 depth encodings in ONE capture → both decode to mm
  (reference src/detector/dataset.py:68-81 only handled 8UC4);
* NaN/±inf float32 depth pixels (real iOS no-return regions) → sanitised
  to 0 mm, the invalid sentinel the projection's min_depth mask rejects;
* truncated/corrupt image files on disk → LOUD ValueError naming the path
  (missing file stays FileNotFoundError);
* truncated/corrupt blobs inside the .db → skip-with-warning, ordinals
  gap-preserving (same contract as NULL blobs);
* duplicate node ids (broken export without the PRIMARY KEY) → collapsed
  to first occurrence with a warning, later frames keep their pose rows;
* out-of-order/non-contiguous node ids → ORDER BY pins frame numbering;
* missing calibration YAML → LOUD FileNotFoundError (calibration is
  load-bearing for 3D projection); malformed YAML → ValueError with path;
* pose table longer than the frame set (trailing rows) → extras ignored;
  shorter → overflow frames dropped (reference min(frames, poses) rule).
"""

import os
import sqlite3

import cv2
import numpy as np
import pytest

from tpu3dlm.data import synthetic
from tpu3dlm.data.calibration import load_calibration, write_calibration
from tpu3dlm.data.dataset import load_depth_image, load_rgb_image, load_scan
from tpu3dlm.data.rtabmap_db import ImageExtractor, encode_depth


@pytest.fixture(scope="module")
def scan_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("adv_scans")
    scene = synthetic.generate_scan(str(root), "gold_std", num_frames=4)
    return str(root), scene


def _depth_png_8uc4(path: str, depth_m: np.ndarray) -> None:
    cv2.imwrite(path, encode_depth(depth_m))


def _write_capture(tmp_path, n=3, h=8, w=6):
    """Minimal on-disk capture: n frames of 8UC4 depth + rgb + calibration."""
    rgb_dir, depth_dir, calib_dir = (
        str(tmp_path / "rgb"), str(tmp_path / "depth"), str(tmp_path / "calib")
    )
    for d in (rgb_dir, depth_dir, calib_dir):
        os.makedirs(d, exist_ok=True)
    for i in range(1, n + 1):
        depth = np.full((h, w), 1.5 + 0.1 * i, np.float32)
        _depth_png_8uc4(os.path.join(depth_dir, f"{i}.png"), depth)
        cv2.imwrite(
            os.path.join(rgb_dir, f"{i}.jpg"),
            np.full((h * 4, w * 4, 3), 40 * i, np.uint8),
        )
        write_calibration(
            os.path.join(calib_dir, f"{i}.yaml"), w * 4, h * 4, 50, 50, 12, 16
        )
    return rgb_dir, depth_dir, calib_dir, (h, w)


def _write_poses(path, n):
    rows = [
        f"{i} {0.1 * i} 0 0 0 0 0 1 {i}" for i in range(1, n + 1)
    ]
    with open(path, "w") as f:
        f.write("# timestamp x y z qx qy qz qw id\n" + "\n".join(rows) + "\n")


class TestMixedDepthEncodings:
    def test_one_capture_both_codecs(self, tmp_path):
        rgb_dir, depth_dir, calib_dir, (h, w) = _write_capture(tmp_path, n=3)
        # frame 2 becomes a 16UC1 millimetre export (desktop/OpenNI style)
        mm = np.full((h, w), 1700, np.uint16)
        cv2.imwrite(os.path.join(depth_dir, "2.png"), mm)
        _write_poses(str(tmp_path / "poses.txt"), 3)
        scan = load_scan(
            rgb_dir, depth_dir, calib_dir, str(tmp_path / "poses.txt"),
            img_size=32, depth_width=w, depth_height=h,
        )
        assert scan.num_frames == 3
        d = np.asarray(scan.depth)
        np.testing.assert_allclose(d[0], 1600.0, rtol=1e-6)  # 8UC4, m→mm
        np.testing.assert_allclose(d[1], 1700.0)  # 16UC1 already mm
        np.testing.assert_allclose(d[2], 1800.0, rtol=1e-6)


class TestNonFiniteDepth:
    def test_nan_inf_pixels_sanitised_to_invalid(self, tmp_path):
        h, w = 8, 6
        depth = np.full((h, w), 2.0, np.float32)
        depth[0, 0] = np.nan
        depth[1, 1] = np.inf
        depth[2, 2] = -np.inf
        p = str(tmp_path / "1.png")
        _depth_png_8uc4(p, depth)
        out = load_depth_image(p, h, w)
        assert np.isfinite(out).all()
        assert out[0, 0] == 0.0 and out[1, 1] == 0.0 and out[2, 2] == 0.0
        np.testing.assert_allclose(out[4, 4], 2000.0, rtol=1e-6)

    def test_sampled_median_rejects_sanitised_pixels(self, tmp_path):
        """End contract: a box whose region contains (former) NaN pixels
        still gets the median of the VALID depths."""
        import jax.numpy as jnp

        from tpu3dlm.ops.geometry import bbox_sampled_median_depth

        h, w = 16, 16
        depth = np.full((h, w), 1500.0, np.float32)
        depth[4:8, 4:8] = 0.0  # the sanitised no-return region
        z, ok = bbox_sampled_median_depth(
            jnp.asarray(depth), jnp.asarray([2.0, 2.0, 13.0, 13.0], jnp.float32)
        )
        assert bool(ok) and float(z) == 1500.0


class TestCorruptFiles:
    def test_truncated_depth_png_raises_valueerror(self, tmp_path):
        p = str(tmp_path / "1.png")
        depth = np.full((8, 6), 1.0, np.float32)
        _depth_png_8uc4(p, depth)
        blob = open(p, "rb").read()
        with open(p, "wb") as f:
            f.write(blob[: len(blob) // 3])  # truncate mid-stream
        with pytest.raises(ValueError, match="1.png"):
            load_depth_image(p, 8, 6)

    def test_missing_depth_png_raises_filenotfound(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_depth_image(str(tmp_path / "nope.png"), 8, 6)

    def test_corrupt_rgb_raises_valueerror(self, tmp_path):
        p = str(tmp_path / "1.jpg")
        with open(p, "wb") as f:
            f.write(b"\xff\xd8\xff\xe0 not really a jpeg")
        with pytest.raises(ValueError, match="1.jpg"):
            load_rgb_image(p)

    def test_wrong_pixel_count_raises(self, tmp_path):
        p = str(tmp_path / "1.png")
        _depth_png_8uc4(p, np.full((8, 6), 1.0, np.float32))
        with pytest.raises(ValueError, match="expects 4x4"):
            load_depth_image(p, 4, 4)


class TestCorruptDbBlobs:
    def test_truncated_blob_skipped_ordinals_preserved(self, scan_dir, tmp_path):
        import shutil

        root, _ = scan_dir
        db = str(tmp_path / "trunc.db")
        shutil.copy(os.path.join(root, "gold_std", "data.db"), db)
        conn = sqlite3.connect(db)
        (blob,) = conn.execute("SELECT depth FROM Data WHERE id = 2").fetchone()
        conn.execute(
            "UPDATE Data SET depth = ? WHERE id = 2", (blob[: len(blob) // 4],)
        )
        conn.commit()
        conn.close()
        ex = ImageExtractor(db, str(tmp_path / "d"), str(tmp_path / "r"))
        n = ex.fetch_data()
        ex.close()
        assert n == 3 and ex.node_ordinals == [1, 3, 4]
        assert not os.path.exists(str(tmp_path / "d" / "2.png"))


class TestBrokenNodeIds:
    def _db(self, tmp_path, rows, name="broken.db", pk=False):
        """Build a db whose Node/Data tables LACK the PRIMARY KEY (so
        duplicates/out-of-order rows are possible, like a hand-repaired
        export)."""
        db = str(tmp_path / name)
        conn = sqlite3.connect(db)
        idcol = "id INTEGER PRIMARY KEY" if pk else "id INTEGER"
        conn.execute(f"CREATE TABLE Node ({idcol})")
        conn.execute(f"CREATE TABLE Data ({idcol}, image BLOB, depth BLOB)")
        for node_id, val in rows:
            depth = np.full((4, 4), float(val), np.float32)
            ok, png = cv2.imencode(".png", encode_depth(depth))
            assert ok
            ok, jpg = cv2.imencode(".jpg", np.full((8, 8, 3), 10, np.uint8))
            assert ok
            conn.execute("INSERT INTO Node VALUES (?)", (node_id,))
            conn.execute(
                "INSERT INTO Data VALUES (?, ?, ?)",
                (node_id, jpg.tobytes(), png.tobytes()),
            )
        conn.commit()
        conn.close()
        return db

    def test_duplicate_ids_collapsed_to_first(self, tmp_path):
        # node 2 appears twice (values 2.0 then 9.0) → keep the FIRST; the
        # JOIN fans each dup pair out 4×, all collapsed
        db = self._db(tmp_path, [(1, 1.0), (2, 2.0), (2, 9.0), (3, 3.0)])
        ex = ImageExtractor(db, str(tmp_path / "d"))
        rgbs, depths = ex.fetch_arrays()
        assert len(depths) == 3 and ex.node_ordinals == [1, 2, 3]
        np.testing.assert_allclose(depths[1], 2.0)  # first occurrence won
        n = ex.fetch_data()
        ex.close()
        assert n == 3
        got = load_depth_image(str(tmp_path / "d" / "2.png"), 4, 4)
        np.testing.assert_allclose(got, 2000.0, rtol=1e-6)

    def test_out_of_order_noncontiguous_ids_pinned_by_order_by(self, tmp_path):
        # insertion order 7, 2, 5 — ordinals must follow id order 2, 5, 7
        db = self._db(tmp_path, [(7, 7.0), (2, 2.0), (5, 5.0)])
        ex = ImageExtractor(db, str(tmp_path / "d"))
        _, depths = ex.fetch_arrays()
        ex.close()
        np.testing.assert_allclose(depths[0], 2.0)
        np.testing.assert_allclose(depths[1], 5.0)
        np.testing.assert_allclose(depths[2], 7.0)
        # ordinals are positions among distinct ids (pose-row pairing),
        # not the raw ids themselves
        assert ex.node_ordinals == [1, 2, 3]


class TestCalibrationVariance:
    def test_missing_yaml_is_loud(self, tmp_path):
        rgb_dir, depth_dir, calib_dir, (h, w) = _write_capture(tmp_path, n=2)
        os.remove(os.path.join(calib_dir, "2.yaml"))
        _write_poses(str(tmp_path / "poses.txt"), 2)
        with pytest.raises(FileNotFoundError, match="2.yaml"):
            load_scan(
                rgb_dir, depth_dir, calib_dir, str(tmp_path / "poses.txt"),
                img_size=32, depth_width=w, depth_height=h,
            )

    def test_yaml_without_camera_matrix(self, tmp_path):
        p = str(tmp_path / "c.yaml")
        with open(p, "w") as f:
            f.write("image_width: 640\nimage_height: 480\n")
        with pytest.raises(ValueError, match="camera_matrix"):
            load_calibration(p)

    def test_yaml_with_short_matrix(self, tmp_path):
        p = str(tmp_path / "c.yaml")
        with open(p, "w") as f:
            f.write("camera_matrix:\n  data: [1.0, 2.0]\n")
        with pytest.raises(ValueError, match="row-major 3x3"):
            load_calibration(p)

    def test_non_mapping_yaml(self, tmp_path):
        p = str(tmp_path / "c.yaml")
        with open(p, "w") as f:
            f.write("- just\n- a\n- list\n")
        with pytest.raises(ValueError, match="camera_matrix"):
            load_calibration(p)


class TestPoseTableVariance:
    def test_trailing_pose_rows_ignored(self, tmp_path):
        rgb_dir, depth_dir, calib_dir, (h, w) = _write_capture(tmp_path, n=3)
        _write_poses(str(tmp_path / "poses.txt"), 6)  # 3 extra rows
        scan = load_scan(
            rgb_dir, depth_dir, calib_dir, str(tmp_path / "poses.txt"),
            img_size=32, depth_width=w, depth_height=h,
        )
        assert scan.num_frames == 3
        # each frame still carries ITS OWN row (x = 0.1 * node)
        np.testing.assert_allclose(
            np.asarray(scan.poses)[:, 0], [0.1, 0.2, 0.3], rtol=1e-6
        )

    def test_short_pose_table_drops_overflow_frames(self, tmp_path):
        rgb_dir, depth_dir, calib_dir, (h, w) = _write_capture(tmp_path, n=4)
        _write_poses(str(tmp_path / "poses.txt"), 2)  # frames 3, 4 orphaned
        scan = load_scan(
            rgb_dir, depth_dir, calib_dir, str(tmp_path / "poses.txt"),
            img_size=32, depth_width=w, depth_height=h,
        )
        assert scan.num_frames == 2
        np.testing.assert_allclose(
            np.asarray(scan.poses)[:, 0], [0.1, 0.2], rtol=1e-6
        )

    def test_unpaired_rgb_dropped_silently(self, tmp_path):
        # rgb 4.jpg has no 4.png depth → the pair never forms (reference
        # _pair_filenames semantics) and the scan holds the other frames
        rgb_dir, depth_dir, calib_dir, (h, w) = _write_capture(tmp_path, n=3)
        cv2.imwrite(
            os.path.join(rgb_dir, "4.jpg"), np.full((32, 24, 3), 9, np.uint8)
        )
        _write_poses(str(tmp_path / "poses.txt"), 4)
        scan = load_scan(
            rgb_dir, depth_dir, calib_dir, str(tmp_path / "poses.txt"),
            img_size=32, depth_width=w, depth_height=h,
        )
        assert scan.num_frames == 3
