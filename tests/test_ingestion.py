"""L1 ingestion tests: synthetic scan generation → extraction → Scan pytree.

Covers the reference contracts: depth CV_8UC4→float32 byte reinterpret
(src/detector/dataset.py:72-77), natural-sorted RGB/depth pairing, poses.txt
parsing (src/mapper/database_query.py:20-25), RTAB-Map SQLite extraction
(src/detector/database_query.py:28-42), and PLY round-trips.
"""

import os

import numpy as np
import pytest

from tpu3dlm.data import ply as plyio
from tpu3dlm.data import synthetic
from tpu3dlm.data.dataset import ScanDataset, load_depth_image, load_scan
from tpu3dlm.data.poses import load_poses, poses_from_dataframe, poses_to_dataframe
from tpu3dlm.data.rtabmap_db import ImageExtractor, encode_depth, reinterpret_depth
from tpu3dlm.data.scan import Detections, detections_from_frame_dict
from tpu3dlm.utils.natsort import natsorted


@pytest.fixture(scope="module")
def scan_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("scans")
    scene = synthetic.generate_scan(str(root), "gold_std", num_frames=4)
    return str(root), scene


class TestNatsort:
    def test_numeric_order(self):
        names = ["10.jpg", "2.jpg", "1.jpg", "21.jpg", "3.jpg"]
        assert natsorted(names) == ["1.jpg", "2.jpg", "3.jpg", "10.jpg", "21.jpg"]


class TestDepthCodec:
    def test_byte_reinterpret_roundtrip(self, rng):
        depth = rng.uniform(0.1, 5.0, size=(16, 12)).astype(np.float32)
        u8 = encode_depth(depth)
        assert u8.shape == (16, 12, 4) and u8.dtype == np.uint8
        back = reinterpret_depth(u8)
        np.testing.assert_array_equal(back, depth)  # bit-exact

    def test_depth_png_roundtrip(self, scan_dir):
        root, scene = scan_dir
        depth_dir = os.path.join(root, "gold_std", "rtabmap_extract", "data_depth")
        d = load_depth_image(os.path.join(depth_dir, "1.png"), 256, 192)
        assert d.shape == (256, 192)
        # wall at ~3m from camera at x=-0.5 → depth(mm) near 3000 at centre
        assert 2000.0 < d[128, 96] < 4000.0

    def test_cv8uc4_decode_matches_handwritten_ieee754(self, tmp_path):
        """Pin the byte/channel order against hand-assembled IEEE-754
        little-endian float32 patterns — NOT against this repo's own
        ``encode_depth`` (VERDICT round-1 item 2: the synthetic-scan ingest
        tests were circular, encoder defined as the decoder's inverse).

        The four uint8 channels of each CV_8UC4 pixel are the float's bytes
        LSB-first in memory (OpenCV BGRA in-memory layout survives the
        imwrite/imread PNG roundtrip unchanged), per the reference decode
        at src/detector/dataset.py:72-77.
        """
        import cv2

        # IEEE-754 single precision, written out by hand:
        #   1.0  = 0x3F800000   2.5   = 0x40200000
        #   0.25 = 0x3E800000   3.125 = 0x40480000
        pixels = np.array(
            [
                [[0x00, 0x00, 0x80, 0x3F], [0x00, 0x00, 0x20, 0x40]],
                [[0x00, 0x00, 0x80, 0x3E], [0x00, 0x00, 0x48, 0x40]],
            ],
            np.uint8,
        )  # (2, 2, 4) — bytes LSB..MSB per pixel
        path = str(tmp_path / "handmade.png")
        assert cv2.imwrite(path, pixels)
        d = load_depth_image(path, 2, 2)
        np.testing.assert_array_equal(
            d, np.array([[1000.0, 2500.0], [250.0, 3125.0]], np.float32)
        )
        # and the in-memory reinterpret agrees (metres)
        np.testing.assert_array_equal(
            reinterpret_depth(pixels),
            np.array([[1.0, 2.5], [0.25, 3.125]], np.float32),
        )

    def test_16uc1_millimetre_depth(self, tmp_path):
        """16UC1 PNG depth (common desktop/OpenNI RTAB-Map export) is
        auto-detected: values are already millimetres."""
        import cv2

        mm = np.array([[0, 1500], [3000, 65000]], np.uint16)
        path = str(tmp_path / "depth16.png")
        assert cv2.imwrite(path, mm)
        d = load_depth_image(path, 2, 2)
        assert d.dtype == np.float32
        np.testing.assert_array_equal(d, mm.astype(np.float32))
        # stored resolution differing from calibration → nearest resize
        d4 = load_depth_image(path, 4, 4)
        assert d4.shape == (4, 4)
        assert set(np.unique(d4)) <= set(mm.astype(np.float32).ravel())
        # blob-level decode returns metres
        np.testing.assert_allclose(
            reinterpret_depth(mm), mm.astype(np.float32) / 1000.0
        )

    def test_16bit_4channel_rejected(self, tmp_path):
        """A 16-bit RGBA PNG passes the CV_8UC4 SHAPE check but its bytes
        are not a float32 stream — byte-viewing uint16 pairs would produce
        garbage depth. The decoder must reject on dtype, loudly."""
        import cv2

        import pytest

        rgba16 = np.full((2, 2, 4), 1234, np.uint16)
        path = str(tmp_path / "depth16rgba.png")
        assert cv2.imwrite(path, rgba16)
        raw = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        assert raw.dtype == np.uint16 and raw.shape[2] == 4  # premise holds
        with pytest.raises(ValueError, match="neither CV_8UC4 nor 16UC1"):
            load_depth_image(path, 2, 2)


class TestPoses:
    def test_load_poses(self, scan_dir):
        root, scene = scan_dir
        ts, poses = load_poses(os.path.join(root, "gold_std", "poses.txt"))
        assert poses.shape == (4, 7)
        np.testing.assert_allclose(poses, scene.poses, atol=1e-5)

    def test_dataframe_roundtrip(self, scan_dir):
        root, scene = scan_dir
        ts, poses = load_poses(os.path.join(root, "gold_std", "poses.txt"))
        df = poses_to_dataframe(ts, poses)
        assert list(df.columns) == ["timestamp", "tx", "ty", "tz", "qx", "qy", "qz", "qw"]
        back = poses_from_dataframe(df)
        np.testing.assert_allclose(back, poses, atol=1e-6)


class TestExtractor:
    def test_db_matches_files(self, scan_dir, tmp_path):
        root, scene = scan_dir
        db_path = os.path.join(root, "gold_std", "data.db")
        out_depth = str(tmp_path / "depth")
        out_rgb = str(tmp_path / "rgb")
        ex = ImageExtractor(db_path, out_depth, out_rgb)
        n = ex.fetch_data()
        ex.close()
        assert n == 4
        # extracted depth PNG decodes identically to the generator's file
        got = load_depth_image(os.path.join(out_depth, "1.png"), 256, 192)
        want = load_depth_image(
            os.path.join(root, "gold_std", "rtabmap_extract", "data_depth", "1.png"),
            256,
            192,
        )
        np.testing.assert_array_equal(got, want)
        assert os.path.exists(os.path.join(out_rgb, "1.jpg"))

    def test_fetch_arrays(self, scan_dir):
        root, scene = scan_dir
        ex = ImageExtractor(
            os.path.join(root, "gold_std", "data.db"), "/tmp/_ignore_depth"
        )
        rgbs, depths = ex.fetch_arrays()
        ex.close()
        assert len(rgbs) == len(depths) == 4
        assert depths[0].dtype == np.float32
        assert rgbs[0].shape == (640, 480, 3)

    def test_null_blobs_skipped_in_sync(self, scan_dir, tmp_path):
        """Real RTAB-Map exports carry RGB-only / depth-only nodes (NULL
        blobs). Regression: a NULL image used to append depth WITHOUT its
        rgb, silently pairing every later rgb with the wrong depth; a NULL
        depth crashed np.frombuffer."""
        import shutil
        import sqlite3

        root, scene = scan_dir
        db = str(tmp_path / "holey.db")
        shutil.copy(os.path.join(root, "gold_std", "data.db"), db)
        conn = sqlite3.connect(db)
        # node 2 loses its image, node 3 loses its depth
        conn.execute("UPDATE Data SET image = NULL WHERE id = 2")
        conn.execute("UPDATE Data SET depth = NULL WHERE id = 3")
        conn.commit()
        conn.close()

        ex = ImageExtractor(db, str(tmp_path / "d"), str(tmp_path / "r"))
        rgbs, depths = ex.fetch_arrays()
        assert len(rgbs) == len(depths) == 2  # nodes 1 and 4 survive
        # pairing stays aligned: frame 4's depth goes with frame 4's rgb
        ref = ImageExtractor(
            os.path.join(root, "gold_std", "data.db"), "/tmp/_ignore_depth2"
        )
        all_rgbs, all_depths = ref.fetch_arrays()
        ref.close()
        np.testing.assert_array_equal(rgbs[1], all_rgbs[3])
        np.testing.assert_array_equal(depths[1], all_depths[3])
        # in-memory path records which node each kept frame came from
        assert ex.node_ordinals == [1, 4]
        # file path: NULL depth skipped (no crash), numbering GAP-PRESERVING
        # — node 4's frame stays "4", so it still pairs with poses.txt row 4
        # (contiguous renumbering used to shift it onto node 3's pose)
        n = ex.fetch_data()
        ex.close()
        assert n == 3  # node 3 (no depth) skipped; 1, 2, 4 written
        assert not os.path.exists(os.path.join(str(tmp_path / "d"), "3.png"))
        assert os.path.exists(os.path.join(str(tmp_path / "d"), "4.png"))

    def test_skipped_node_keeps_pose_pairing(self, scan_dir, tmp_path):
        """A depth-less node in the middle of a capture must not shift
        every later frame onto the previous node's poses.txt row: the
        extractor keeps node-ordinal filenames across the gap and
        load_scan pairs pose rows by the numeric stem, not by position."""
        import shutil
        import sqlite3

        from tpu3dlm.data.dataset import load_scan

        root, scene = scan_dir
        gold = os.path.join(root, "gold_std")
        db = str(tmp_path / "holey.db")
        shutil.copy(os.path.join(gold, "data.db"), db)
        conn = sqlite3.connect(db)
        conn.execute("UPDATE Data SET depth = NULL WHERE id = 2")
        conn.commit()
        conn.close()

        depth_dir = str(tmp_path / "depth")
        rgb_dir = str(tmp_path / "rgb")
        ex = ImageExtractor(db, depth_dir, rgb_dir)
        n = ex.fetch_data()
        ex.close()
        assert n == 3 and ex.node_ordinals == [1, 3, 4]

        # calibration YAMLs pair by stem too — reuse the capture's own
        calib_dir = os.path.join(gold, "rtabmap_extract", "calibration")
        scan = load_scan(
            rgb_dir, depth_dir, calib_dir, os.path.join(gold, "poses.txt"),
            img_size=64,
        )
        assert scan.num_frames == 3
        _, all_poses = load_poses(os.path.join(gold, "poses.txt"))
        # frames after the gap carry THEIR OWN pose rows (2 and 3), not the
        # shifted rows (1 and 2) positional pairing would hand them
        np.testing.assert_array_equal(
            np.asarray(scan.poses), all_poses[[0, 2, 3]]
        )


class TestPLY:
    def test_binary_roundtrip(self, tmp_path, rng):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        cols = rng.uniform(size=(100, 3)).astype(np.float32)
        p = str(tmp_path / "a.ply")
        plyio.save_ply(p, pts, cols)
        pts2, cols2 = plyio.load_ply(p)
        np.testing.assert_array_equal(pts2, pts)
        np.testing.assert_allclose(cols2, cols, atol=1 / 255.0)

    def test_ascii_roundtrip(self, tmp_path, rng):
        pts = rng.normal(size=(10, 3)).astype(np.float32)
        p = str(tmp_path / "b.ply")
        plyio.save_ply(p, pts, binary=False)
        pts2, cols2 = plyio.load_ply(p)
        assert cols2 is None
        np.testing.assert_allclose(pts2, pts, rtol=1e-5)

    def test_nan_points_dropped(self, tmp_path):
        pts = np.array([[0, 0, 0], [np.nan, 1, 1], [2, 2, 2]], np.float32)
        p = str(tmp_path / "c.ply")
        plyio.save_ply(p, pts)
        pts2, _ = plyio.load_ply(p)
        assert pts2.shape == (2, 3)

    def test_truncated_mesh_header_raises(self, tmp_path):
        """Regression: load_ply_mesh spun forever on EOF mid-header
        (readline at EOF returns b'' forever with no guard)."""
        p = str(tmp_path / "trunc.ply")
        with open(p, "wb") as f:
            f.write(b"ply\nformat binary_little_endian 1.0\nelement vertex 3\n")
        with pytest.raises(ValueError, match="unexpected EOF"):
            plyio.load_ply_mesh(p)

    def test_ascii_zero_vertices(self, tmp_path):
        """A legitimate 0-vertex ascii cloud loads as (0, 3) (used to
        IndexError on the 1-D empty array)."""
        p = str(tmp_path / "empty.ply")
        with open(p, "wb") as f:
            f.write(
                b"ply\nformat ascii 1.0\nelement vertex 0\n"
                b"property float x\nproperty float y\nproperty float z\n"
                b"end_header\n"
            )
        pts, cols = plyio.load_ply(p)
        assert pts.shape == (0, 3) and cols is None

    def test_ascii_truncated_vertices_raise(self, tmp_path):
        p = str(tmp_path / "shorty.ply")
        with open(p, "wb") as f:
            f.write(
                b"ply\nformat ascii 1.0\nelement vertex 2\n"
                b"property float x\nproperty float y\nproperty float z\n"
                b"end_header\n0 0 0\n"
            )
        with pytest.raises(ValueError, match="truncated ascii PLY"):
            plyio.load_ply(p)

    def test_uchar_near_black_colors_scaled(self, tmp_path):
        """Regression: uchar colors all <= 1 dodged the max()>1 value
        heuristic and loaded as FULL intensity — scaling must follow the
        declared property dtype."""
        p = str(tmp_path / "dark.ply")
        header = (
            b"ply\nformat binary_little_endian 1.0\nelement vertex 2\n"
            b"property float x\nproperty float y\nproperty float z\n"
            b"property uchar red\nproperty uchar green\nproperty uchar blue\n"
            b"end_header\n"
        )
        rec = np.zeros(2, dtype=np.dtype(
            [("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
             ("red", "u1"), ("green", "u1"), ("blue", "u1")]
        ))
        rec["red"] = [1, 0]
        with open(p, "wb") as f:
            f.write(header)
            f.write(rec.tobytes())
        pts, cols = plyio.load_ply(p)
        np.testing.assert_allclose(cols[0], [1 / 255.0, 0, 0], atol=1e-6)

    def test_generated_cloud_loads(self, scan_dir):
        root, scene = scan_dir
        pts, cols = plyio.load_ply(os.path.join(root, "gold_std", "cloud.ply"))
        assert pts.shape[0] > 1000
        assert cols is not None
        # wall points sit at z == wall_z
        assert np.isclose(np.median(pts[:, 2]), scene.wall_z, atol=0.3)


class TestScanDataset:
    def test_indexing_and_modes(self, scan_dir):
        root, scene = scan_dir
        base = os.path.join(root, "gold_std", "rtabmap_extract")
        ds = ScanDataset(
            image_dir=os.path.join(base, "data_rgb"),
            depth_image_dir=os.path.join(base, "data_depth"),
            calibration_dir=os.path.join(base, "calibration"),
            img_size=320,
            processing=True,
        )
        assert len(ds) == 4
        rgb, depth, calib = ds[0]
        assert rgb.shape == (320, 320, 3)
        assert depth.shape == (256, 192)
        assert calib["image_width"] == 480
        ds2 = ScanDataset(
            image_dir=os.path.join(base, "data_rgb"),
            depth_image_dir=os.path.join(base, "data_depth"),
            calibration_dir=os.path.join(base, "calibration"),
            img_size=320,
            processing=False,
        )
        rgb2, _, _ = ds2[0]
        assert rgb2.shape == (256, 192, 3)

    def test_load_scan_pytree(self, scan_dir):
        root, scene = scan_dir
        base = os.path.join(root, "gold_std", "rtabmap_extract")
        scan = load_scan(
            image_dir=os.path.join(base, "data_rgb"),
            depth_image_dir=os.path.join(base, "data_depth"),
            calibration_dir=os.path.join(base, "calibration"),
            pose_path=os.path.join(root, "gold_std", "poses.txt"),
            img_size=320,
        )
        assert scan.num_frames == 4
        assert scan.rgb.shape == (4, 320, 320, 3)
        assert scan.depth.shape == (4, 256, 192)
        assert scan.intrinsics.shape == (4, 4)
        np.testing.assert_allclose(scan.poses, scene.poses, atol=1e-5)
        fx = scene.intrinsics[0]
        np.testing.assert_allclose(scan.intrinsics[:, 0], fx, rtol=1e-6)


class TestDetectionsPytree:
    def test_frame_dict_roundtrip(self, scan_dir):
        root, scene = scan_dir
        # synthesize reference-shaped records with damage inserted at -2
        preds = {
            f: [b[:4] + [0, b[4], b[5]] for b in boxes]
            for f, boxes in scene.gt_boxes_2d.items()
        }
        det = detections_from_frame_dict(preds, num_frames=4)
        assert isinstance(det, Detections)
        back = det.to_frame_dict()
        for f in range(4):
            assert len(back[f]) == len(preds[f])
            for a, b in zip(back[f], preds[f]):
                np.testing.assert_allclose(a[:4], b[:4], rtol=1e-6)
                assert a[4] == b[4] and a[6] == b[6]

    def test_gt_boxes_exist(self, scan_dir):
        root, scene = scan_dir
        total = sum(len(v) for v in scene.gt_boxes_2d.values())
        assert total >= 6  # signs visible across frames


class TestScanCache:
    def test_cache_roundtrip_identical(self, scan_dir):
        root, scene = scan_dir
        base = os.path.join(root, "gold_std", "rtabmap_extract")
        kwargs = dict(
            image_dir=os.path.join(base, "data_rgb"),
            depth_image_dir=os.path.join(base, "data_depth"),
            calibration_dir=os.path.join(base, "calibration"),
            pose_path=os.path.join(root, "gold_std", "poses.txt"),
            img_size=160,
        )
        from tpu3dlm.data.dataset import load_scan as _ls

        s1 = _ls(**kwargs, cache=True)  # builds + writes the pack
        pack = os.path.join(base, "scan_160.pack")
        assert os.path.exists(pack) or os.path.exists(pack + ".npz")
        s2 = _ls(**kwargs, cache=True)  # reads the pack
        np.testing.assert_array_equal(np.asarray(s1.rgb), np.asarray(s2.rgb))
        np.testing.assert_array_equal(np.asarray(s1.depth), np.asarray(s2.depth))
        np.testing.assert_array_equal(np.asarray(s1.poses), np.asarray(s2.poses))

    def test_cache_hit_serves_live_poses(self, scan_dir):
        """poses.txt rewritten in place (same frame count — e.g. a re-run
        pose-graph optimization) must flow through a pack-cache HIT: the
        source fingerprint covers image bytes only, so the cached return
        has to serve the live poses, not the pack's stored copy (matching
        the streaming path)."""
        root, scene = scan_dir
        base = os.path.join(root, "gold_std", "rtabmap_extract")
        pose_path = os.path.join(root, "gold_std", "poses.txt")
        kwargs = dict(
            image_dir=os.path.join(base, "data_rgb"),
            depth_image_dir=os.path.join(base, "data_depth"),
            calibration_dir=os.path.join(base, "calibration"),
            pose_path=pose_path,
            img_size=160,
        )
        from tpu3dlm.data.dataset import load_scan as _ls

        s1 = _ls(**kwargs, cache=True)  # builds + writes the pack
        # rewrite poses in place: shift every translation by +1 in x
        # (first line is the header — load_poses skiprows=1)
        lines = open(pose_path).read().strip().splitlines()
        out = [lines[0]]
        for ln in lines[1:]:
            parts = ln.split()
            parts[1] = str(float(parts[1]) + 1.0)
            out.append(" ".join(parts))
        with open(pose_path, "w") as f:
            f.write("\n".join(out) + "\n")
        s2 = _ls(**kwargs, cache=True)  # pack cache hit (images unchanged)
        np.testing.assert_array_equal(np.asarray(s1.rgb), np.asarray(s2.rgb))
        np.testing.assert_allclose(
            np.asarray(s2.poses)[:, 0], np.asarray(s1.poses)[:, 0] + 1.0,
            atol=1e-5,
        )

    def _stream_kwargs(self, root, img_size=160):
        base = os.path.join(root, "gold_std", "rtabmap_extract")
        return dict(
            image_dir=os.path.join(base, "data_rgb"),
            depth_image_dir=os.path.join(base, "data_depth"),
            calibration_dir=os.path.join(base, "calibration"),
            pose_path=os.path.join(root, "gold_std", "poses.txt"),
            img_size=img_size,
            chunk_frames=2,
        )

    def test_threaded_decode_bit_identical(self, scan_dir):
        """decode_workers>1 writes disjoint rows from a thread pool — the
        result must be bit-identical to the sequential path."""
        from tpu3dlm.data.dataset import load_scan as _ls

        root, _ = scan_dir
        kwargs = self._stream_kwargs(root, img_size=160)
        kwargs.pop("chunk_frames")
        seq = _ls(**kwargs)
        par = _ls(**kwargs, workers=4)
        for field in ("rgb", "depth", "intrinsics", "rgb_size", "poses"):
            np.testing.assert_array_equal(
                np.asarray(getattr(seq, field)), np.asarray(getattr(par, field))
            )

    def test_stream_cache_decode_free(self, scan_dir, monkeypatch):
        """Second streamed pass must serve chunks from the memmap pack with
        ZERO image decodes, byte-identical to the decoding pass."""
        import tpu3dlm.data.dataset as ds

        root, _ = scan_dir
        kwargs = self._stream_kwargs(root, img_size=144)  # fresh pack size
        first = [c for c in ds.iter_scan_chunks(**kwargs, cache=True)]
        pack = os.path.join(root, "gold_std", "rtabmap_extract", "scan_144.pack")
        assert os.path.exists(pack)

        def _boom(*a, **k):
            raise AssertionError("decode called on a cached streaming pass")

        monkeypatch.setattr(ds, "_decode_frames", _boom)
        second = [c for c in ds.iter_scan_chunks(**kwargs, cache=True)]
        assert len(first) == len(second)
        for (c1, v1), (c2, v2) in zip(first, second):
            assert v1 == v2
            np.testing.assert_array_equal(np.asarray(c1.rgb), np.asarray(c2.rgb))
            np.testing.assert_array_equal(np.asarray(c1.depth), np.asarray(c2.depth))
            np.testing.assert_array_equal(
                np.asarray(c1.intrinsics), np.asarray(c2.intrinsics)
            )
            np.testing.assert_array_equal(np.asarray(c1.poses), np.asarray(c2.poses))

    def test_stream_abandoned_pack_ignored(self, scan_dir):
        """A stream stopped mid-way must not leave a pack that later loads —
        the magic is only stamped after the final chunk."""
        from tpu3dlm.native import scanpack_memmap

        root, _ = scan_dir
        kwargs = self._stream_kwargs(root, img_size=152)
        import tpu3dlm.data.dataset as ds

        it = ds.iter_scan_chunks(**kwargs, cache=True)
        next(it)  # one chunk, then abandon
        it.close()
        pack = os.path.join(root, "gold_std", "rtabmap_extract", "scan_152.pack")
        assert os.path.exists(pack)
        assert scanpack_memmap(pack) is None  # unfinalised → invalid
        # a full pass then rebuilds and finalises it
        list(ds.iter_scan_chunks(**kwargs, cache=True))
        assert scanpack_memmap(pack) is not None


class TestScanCacheStaleness:
    """A capture RE-EXPORTED in place (same frame count, different bytes)
    must invalidate the scanpack — staleness was previously keyed only on
    frame count and shapes."""

    def _kwargs(self, root, img_size=160):
        base = os.path.join(root, "gold_std", "rtabmap_extract")
        return dict(
            image_dir=os.path.join(base, "data_rgb"),
            depth_image_dir=os.path.join(base, "data_depth"),
            calibration_dir=os.path.join(base, "calibration"),
            pose_path=os.path.join(root, "gold_std", "poses.txt"),
            img_size=img_size,
        )

    def _reexport_first_frame(self, root):
        import cv2

        rgb_dir = os.path.join(root, "gold_std", "rtabmap_extract", "data_rgb")
        p = os.path.join(rgb_dir, sorted(os.listdir(rgb_dir))[0])
        img = cv2.imread(p)
        cv2.imwrite(p, 255 - img)  # same file name/count, different pixels
        t = os.path.getmtime(p) + 10
        os.utime(p, (t, t))  # decouple from mtime granularity

    def test_load_scan_sees_reexported_pixels(self, tmp_path):
        from tpu3dlm.data import synthetic
        from tpu3dlm.data.dataset import load_scan as _ls

        synthetic.generate_scan(str(tmp_path), "gold_std", num_frames=3)
        kwargs = self._kwargs(str(tmp_path))
        s1 = _ls(**kwargs, cache=True)
        self._reexport_first_frame(str(tmp_path))
        s2 = _ls(**kwargs, cache=True)
        assert not np.array_equal(np.asarray(s1.rgb[0]), np.asarray(s2.rgb[0]))
        # pack refreshed: a third load returns the new content from cache
        s3 = _ls(**kwargs, cache=True)
        np.testing.assert_array_equal(np.asarray(s2.rgb), np.asarray(s3.rgb))

    def test_streaming_sees_reexported_pixels(self, tmp_path):
        from tpu3dlm.data import synthetic
        from tpu3dlm.data import dataset as ds

        synthetic.generate_scan(str(tmp_path), "gold_std", num_frames=3)
        kwargs = self._kwargs(str(tmp_path))
        kwargs["chunk_frames"] = 2
        first = [c for c, _ in ds.iter_scan_chunks(**kwargs, cache=True)]
        self._reexport_first_frame(str(tmp_path))
        second = [c for c, _ in ds.iter_scan_chunks(**kwargs, cache=True)]
        assert not np.array_equal(
            np.asarray(first[0].rgb[0]), np.asarray(second[0].rgb[0])
        )

    def test_calibration_change_invalidates_cache(self, scan_dir):
        """A calibration-only re-export (same images, corrected intrinsics)
        must MISS the pack cache: the pack stores parsed intrinsics, and
        the fingerprint used to cover only image/depth bytes."""
        import time as _time

        root, scene = scan_dir
        base = os.path.join(root, "gold_std", "rtabmap_extract")
        calib_dir = os.path.join(base, "calibration")
        kwargs = dict(
            image_dir=os.path.join(base, "data_rgb"),
            depth_image_dir=os.path.join(base, "data_depth"),
            calibration_dir=calib_dir,
            pose_path=os.path.join(root, "gold_std", "poses.txt"),
            img_size=160,
        )
        from tpu3dlm.data.dataset import load_scan as _ls

        s1 = _ls(**kwargs, cache=True)
        # rewrite one calibration yaml with a different fx
        name = natsorted(os.listdir(calib_dir))[0]
        path = os.path.join(calib_dir, name)
        txt = open(path).read()
        # double fx (the first camera_matrix data entry, 432.0)
        new = txt.replace("432.0", "864.0", 1)
        assert new != txt
        _time.sleep(0.01)
        with open(path, "w") as f:
            f.write(new)
        s2 = _ls(**kwargs, cache=True)  # must re-decode, not serve the pack
        assert not np.allclose(
            np.asarray(s1.intrinsics)[0], np.asarray(s2.intrinsics)[0]
        )
