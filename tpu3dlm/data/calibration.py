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
    with open(calibration_path, "r") as f:
        data = yaml.safe_load(f)
    cam = data["camera_matrix"]["data"]
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
