"""Per-frame camera calibration YAML parser.

Parity target: ``ImageDataset._load_calibration`` (reference
src/detector/dataset.py:102-121): reads ``image_width``, ``image_height``
and the row-major 3x3 ``camera_matrix.data`` — fx=[0], fy=[4], cx=[2],
cy=[5].
"""

from __future__ import annotations

import numpy as np
import yaml


def load_calibration(calibration_path: str) -> dict:
    """Parse one calibration YAML; errors are pinned LOUD with the path.

    A missing file raises FileNotFoundError (calibration is load-bearing
    for 3D projection — silently substituting intrinsics would corrupt
    every world coordinate); a file that parses but lacks the RTAB-Map
    layout (no ``camera_matrix.data`` or a matrix shorter than the
    row-major 3x3 the reference indexes, src/detector/dataset.py:102-121)
    raises ValueError naming the file instead of an opaque KeyError.
    """
    with open(calibration_path, "r") as f:
        data = yaml.safe_load(f)
    try:
        cam = data["camera_matrix"]["data"]
    except (KeyError, TypeError) as e:
        raise ValueError(
            f"calibration YAML {calibration_path} has no camera_matrix.data "
            "(not an RTAB-Map export?)"
        ) from e
    if not isinstance(cam, (list, tuple)) or len(cam) < 6:
        raise ValueError(
            f"calibration YAML {calibration_path}: camera_matrix.data must "
            f"be a row-major 3x3 (got {cam!r})"
        )
    return {
        "image_width": data.get("image_width"),
        "image_height": data.get("image_height"),
        "fx": cam[0],
        "fy": cam[4],
        "cx": cam[2],
        "cy": cam[5],
    }


def write_calibration(
    calibration_path: str,
    image_width: int,
    image_height: int,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
) -> None:
    """Emit a calibration YAML in the RTAB-Map export layout."""
    data = {
        "image_width": int(image_width),
        "image_height": int(image_height),
        "camera_matrix": {
            "rows": 3,
            "cols": 3,
            "data": [float(fx), 0.0, float(cx), 0.0, float(fy), float(cy), 0.0, 0.0, 1.0],
        },
    }
    with open(calibration_path, "w") as f:
        yaml.safe_dump(data, f)


def calibration_to_array(calib: dict) -> tuple[np.ndarray, np.ndarray]:
    """dict → ((fx, fy, cx, cy), (width, height)) float32 arrays."""
    intr = np.array([calib["fx"], calib["fy"], calib["cx"], calib["cy"]], np.float32)
    wh = np.array([calib["image_width"], calib["image_height"]], np.float32)
    return intr, wh
