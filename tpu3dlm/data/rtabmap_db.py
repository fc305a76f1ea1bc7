"""RTAB-Map SQLite (.db) frame extractor.

Parity target: ``ImageExtractor`` (reference src/detector/database_query.py):
``SELECT Data.image, Data.depth FROM Data JOIN Node ON Data.id = Node.id``,
depth blobs decoded with cv2.imdecode and written as ``<idx>.png`` (1-based
index). We additionally support writing the RGB frames (``<idx>.jpg``) so a
bare .db is a complete input, and an in-memory fast path that skips the
PNG round-trip entirely when feeding the TPU directly.
"""

from __future__ import annotations

import os
import sqlite3

import cv2
import numpy as np

# ORDER BY pins the frame numbering to node id: without it SQLite's row
# order is an implementation detail of the query plan, and a plan change
# would silently re-pair every frame with the wrong pose row. The id is
# selected so duplicate-id rows (a broken export without the PRIMARY KEY
# constraint fans out through the JOIN) can be deduplicated — without it a
# duplicate would shift EVERY later frame's ordinal off its pose row.
_QUERY = (
    "SELECT Data.id, Data.image, Data.depth FROM Data JOIN Node "
    "ON Data.id = Node.id ORDER BY Data.id"
)


def _iter_unique_rows(cursor):
    """Yield (ordinal, image_blob, depth_blob) with duplicate-id JOIN rows
    collapsed to the FIRST occurrence (warned). Ordinals number the
    DISTINCT node ids 1..K in id order — the same positional pairing with
    poses.txt rows real exports have (one pose row per node)."""
    import logging

    last_id, ordinal, dupes = None, 0, 0
    for node_id, image_blob, depth_blob in cursor:
        if node_id == last_id:
            dupes += 1
            continue
        last_id = node_id
        ordinal += 1
        yield ordinal, image_blob, depth_blob
    if dupes:
        logging.getLogger(__name__).warning(
            "%d duplicate node-id row(s) in the database JOIN were "
            "collapsed to their first occurrence", dupes,
        )


class ImageExtractor:
    """Extract RGB/depth frames from an RTAB-Map database."""

    def __init__(self, db_path: str, depth_dir: str, image_dir: str | None = None):
        self.db_path = db_path
        self.depth_dir = depth_dir
        self.image_dir = image_dir
        os.makedirs(depth_dir, exist_ok=True)
        if image_dir:
            os.makedirs(image_dir, exist_ok=True)
        self.conn = sqlite3.connect(db_path)

    def fetch_data(self) -> int:
        """Write depth PNGs (and RGB JPEGs when image_dir given). Returns frame count.

        Rows with a NULL/undecodable depth blob (RGB-only odometry nodes
        exist in real exports) are SKIPPED with a warning. Filenames carry
        the 1-based NODE ordinal — identical to the reference's contiguous
        numbering when nothing is skipped, but GAP-PRESERVING across a
        skip, so each frame keeps pairing with ITS OWN poses.txt row
        (data/dataset._pose_rows_for_pairs maps ``<k>.jpg`` → pose row
        k-1). Contiguous renumbering would silently shift every later
        frame onto the previous node's pose. ``self.node_ordinals`` records
        the kept ordinals. The cursor streams row by row: fetchall would
        hold every compressed blob of the capture in memory at once.
        """
        import logging

        cursor = self.conn.cursor()
        cursor.execute(_QUERY)
        count, skipped = 0, 0
        self.node_ordinals: list[int] = []
        for ordinal, image_blob, depth_blob in _iter_unique_rows(cursor):
            depth = None
            if depth_blob is not None:
                depth = cv2.imdecode(
                    np.frombuffer(depth_blob, dtype=np.uint8), cv2.IMREAD_UNCHANGED
                )
            if depth is None:
                skipped += 1
                continue
            cv2.imwrite(os.path.join(self.depth_dir, f"{ordinal}.png"), depth)
            if self.image_dir and image_blob is not None:
                with open(os.path.join(self.image_dir, f"{ordinal}.jpg"), "wb") as f:
                    f.write(image_blob)
            self.node_ordinals.append(ordinal)
            count += 1
        if skipped:
            logging.getLogger(__name__).warning(
                "%d database node(s) had no decodable depth and were "
                "skipped — filenames keep the node ordinal so the "
                "remaining %d frames still pair with their poses.txt rows",
                skipped, count,
            )
        return count

    def fetch_arrays(self) -> tuple[list[np.ndarray], list[np.ndarray]]:
        """In-memory fast path: decode straight to (rgb_frames, depth_frames).

        Depth blobs are PNG-encoded CV_8UC4 images whose bytes are float32
        metres (the RTAB-Map iOS export trick — reference
        src/detector/dataset.py:72-77); we do the byte-level reinterpret here
        and return float32 metre images.
        """
        import logging

        cursor = self.conn.cursor()
        cursor.execute(_QUERY)
        rgbs, depths = [], []
        skipped = 0
        # 1-based node ordinal per kept frame — consumers pairing these
        # arrays with poses.txt rows positionally must index rows by
        # ordinal-1 when any node was skipped (see fetch_data docstring)
        self.node_ordinals = []
        for ordinal, image_blob, depth_blob in _iter_unique_rows(cursor):
            # rgb and depth are appended TOGETHER or not at all: appending
            # depth for an RGB-less row desynchronized every later pair
            # (rgbs[i] belonged to depths[i+1]) with no error
            depth_u8 = None
            if depth_blob is not None:
                depth_u8 = cv2.imdecode(
                    np.frombuffer(depth_blob, dtype=np.uint8), cv2.IMREAD_UNCHANGED
                )
            rgb = None
            if image_blob is not None:
                rgb = cv2.imdecode(
                    np.frombuffer(image_blob, dtype=np.uint8), cv2.IMREAD_COLOR
                )
            if depth_u8 is None or rgb is None:
                skipped += 1
                continue
            depths.append(reinterpret_depth(depth_u8))
            rgbs.append(cv2.cvtColor(rgb, cv2.COLOR_BGR2RGB))
            self.node_ordinals.append(ordinal)
        if skipped:
            logging.getLogger(__name__).warning(
                "%d database node(s) missing an RGB or depth blob were "
                "skipped from the in-memory path", skipped,
            )
        return rgbs, depths

    def close(self):
        self.conn.close()

    @staticmethod
    def view_images(directory: str):  # pragma: no cover - interactive
        """Preview the first extracted frame (reference
        src/detector/database_query.py:44-57 parity; needs a display)."""
        import os as _os

        for image_name in sorted(_os.listdir(directory)):
            image = cv2.imread(_os.path.join(directory, image_name))
            cv2.imshow("Image", image)
            cv2.waitKey(0)
            break


def reinterpret_depth(depth_raw: np.ndarray) -> np.ndarray:
    """Decoded RTAB-Map depth image → (H, W) float32 metres.

    Auto-detects the two encodings real exports carry:

    - CV_8UC4 (H, W, 4) uint8 whose bytes are little-endian float32 metres
      (the iOS export trick): a bit-level reinterpretation, NOT a value
      cast (reference src/detector/dataset.py:72-74 reshapes to (H, W*4)
      and flips the dtype field).
    - 16UC1 (H, W) uint16 millimetres (the common desktop/OpenNI export):
      a value cast ÷1000.
    """
    if depth_raw.ndim == 2 and depth_raw.dtype == np.uint16:
        return depth_raw.astype(np.float32) / 1000.0
    if depth_raw.ndim != 3 or depth_raw.shape[2] != 4 or depth_raw.dtype != np.uint8:
        raise ValueError(
            "expected (H, W, 4) uint8 or (H, W) uint16 depth image, got "
            f"{depth_raw.shape} {depth_raw.dtype}"
        )
    h, w = depth_raw.shape[:2]
    depth = np.ascontiguousarray(depth_raw).reshape(h, w * 4).view(np.float32)
    # real iOS exports carry NaN/±inf no-return pixels; 0 m is the invalid
    # sentinel downstream consumers (projection min_depth mask) reject
    return np.nan_to_num(depth, nan=0.0, posinf=0.0, neginf=0.0)


def encode_depth(depth_m: np.ndarray) -> np.ndarray:
    """(H, W) float32 metres → CV_8UC4 image carrying the raw bytes.

    Inverse of `reinterpret_depth`; used by the synthetic-scan generator to
    produce byte-identical RTAB-Map-style depth PNGs.
    """
    h, w = depth_m.shape
    return (
        np.ascontiguousarray(depth_m.astype(np.float32))
        .view(np.uint8)
        .reshape(h, w, 4)
    )
