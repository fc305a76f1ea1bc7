"""RTAB-Map ``poses.txt`` trajectory parser.

Parity target: ``PoseDataExtractor.fetch_data`` (reference
src/mapper/database_query.py:20-25): space-separated file, one header row
skipped, columns [timestamp, tx, ty, tz, qx, qy, qz, qw, id]; the id column
is dropped. We return numpy arrays (the device-facing form) and offer a
pandas DataFrame view for API parity with the reference pickles.
"""

from __future__ import annotations

import numpy as np


def load_poses(pose_path: str) -> tuple[np.ndarray, np.ndarray]:
    """Parse poses.txt → (timestamps (F,), poses (F, 7) [tx..qw])."""
    raw = np.loadtxt(pose_path, skiprows=1, dtype=np.float64, ndmin=2)
    if raw.shape[1] == 9:
        raw = raw[:, :8]  # drop trailing id column
    elif raw.shape[1] != 8:
        raise ValueError(
            f"poses.txt must have 8 or 9 columns, got {raw.shape[1]} in {pose_path}"
        )
    timestamps = raw[:, 0]
    poses = raw[:, 1:8].astype(np.float32)
    return timestamps, poses


def poses_to_dataframe(timestamps: np.ndarray, poses: np.ndarray):
    """DataFrame with the reference's column layout (timestamp as datetime)."""
    import pandas as pd

    df = pd.DataFrame(
        {
            "timestamp": pd.to_datetime(timestamps, unit="s"),
            "tx": poses[:, 0],
            "ty": poses[:, 1],
            "tz": poses[:, 2],
            "qx": poses[:, 3],
            "qy": poses[:, 4],
            "qz": poses[:, 5],
            "qw": poses[:, 6],
        }
    )
    return df


def poses_from_dataframe(df) -> np.ndarray:
    """(F, 7) float32 pose array from a reference-shaped DataFrame."""
    cols = ["tx", "ty", "tz", "qx", "qy", "qz", "qw"]
    return df[cols].to_numpy(dtype=np.float32)


class PoseDataExtractor:
    """API parity with the reference's ``PoseDataExtractor``
    (src/mapper/database_query.py:12-46): fetch_data → DataFrame, plot_pose
    renders the trajectory (gated on a display/Open3D being available)."""

    def __init__(self, pose_path: str):
        self.pose_path = pose_path

    def fetch_data(self):
        ts, poses = load_poses(self.pose_path)
        return poses_to_dataframe(ts, poses)

    def plot_pose(self, df):  # pragma: no cover - interactive
        from tpu3dlm.utils.visualisation import Visualiser

        vis = Visualiser()
        cloud = vis.overlay_pose(df)
        try:
            import open3d as o3d

            from tpu3dlm.utils.transformations import Transforms

            directions = Transforms().get_camera_direction(df)
            rays = vis.overlay_pose_directions(
                np.asarray(df[["tx", "ty", "tz"]]), directions
            )
            o3d.visualization.draw_geometries([cloud, rays])
        except Exception:
            return cloud
