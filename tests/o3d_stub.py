"""Open3D test double (VERDICT r3 task 7).

Open3D is not installed in this image, so every ``if _o3d is not None``
presentation branch (utils/visualisation.py, mapper/mapping.py,
data/poses.py) was unexecutable-by-construction. This stub implements the
exact API subset those branches touch — geometry containers, the Poisson
factory, the interactive Visualizer — returning shaped dummies and
recording every windowing call, so tests/test_o3d_paths.py can DRIVE the
branches and pin their behavior (geometry counts, colors, call order)
without a display or the real library.

Intentionally minimal: anything the package does not call raises
AttributeError, which is the test signal that a new Open3D usage needs
stub coverage.
"""

from __future__ import annotations

import numpy as np

# chronological record of windowing/display calls: ("method", detail)
CALLS: list[tuple[str, object]] = []


def reset() -> None:
    del CALLS[:]


class _utility:
    class Vector3dVector:
        def __init__(self, arr):
            self.array = np.asarray(arr, np.float64)
            if self.array.ndim != 2 or self.array.shape[1] != 3:
                raise ValueError(f"Vector3dVector expects (N, 3), got {self.array.shape}")

        def __len__(self):
            return len(self.array)

    class Vector2iVector:
        def __init__(self, arr):
            self.array = np.asarray(arr, np.int32)
            if self.array.ndim != 2 or self.array.shape[1] != 2:
                raise ValueError(f"Vector2iVector expects (N, 2), got {self.array.shape}")

        def __len__(self):
            return len(self.array)

    class Vector3iVector:
        def __init__(self, arr):
            self.array = np.asarray(arr, np.int32)

        def __len__(self):
            return len(self.array)


class _geometry:
    class KDTreeSearchParamHybrid:
        def __init__(self, radius: float, max_nn: int):
            self.radius = radius
            self.max_nn = max_nn

    class PointCloud:
        def __init__(self):
            self.points = None
            self.colors = None
            self.normals = None
            self.color = None

        def paint_uniform_color(self, c):
            self.color = list(c)
            return self

        def estimate_normals(self, search_param=None):
            CALLS.append(("estimate_normals", search_param))
            n = len(self.points) if self.points is not None else 0
            self.normals = _utility.Vector3dVector(np.tile([0.0, 0.0, 1.0], (n, 1)))

    class LineSet:
        def __init__(self, points=None, lines=None):
            self.points = points
            self.lines = lines
            self.color = None

        def paint_uniform_color(self, c):
            self.color = list(c)
            return self

    class TriangleMesh:
        def __init__(self):
            self.vertices = None
            self.triangles = None

        @staticmethod
        def create_from_point_cloud_poisson(pc, depth=8, scale=1.0, **kw):
            CALLS.append(("poisson", {"depth": depth, "n_points": len(pc.points)}))
            if pc.normals is None:
                raise RuntimeError("poisson requires normals (estimate_normals first)")
            mesh = _geometry.TriangleMesh()
            pts = pc.points.array
            n = max(3, min(len(pts), 12))
            mesh.vertices = _utility.Vector3dVector(pts[:n])
            tris = np.stack(
                [np.zeros(n - 2, np.int32), np.arange(1, n - 1, dtype=np.int32),
                 np.arange(2, n, dtype=np.int32)], axis=1,
            )
            mesh.triangles = _utility.Vector3iVector(tris)
            densities = np.ones(n, np.float64)
            return mesh, densities


class _visualization:
    class Visualizer:
        def __init__(self):
            self.geometries = []
            self.window_open = False
            self.ran = False

        def create_window(self, *a, **k):
            CALLS.append(("create_window", None))
            self.window_open = True

        def add_geometry(self, g):
            CALLS.append(("add_geometry", type(g).__name__))
            self.geometries.append(g)

        def run(self):
            CALLS.append(("run", len(self.geometries)))
            self.ran = True

        def destroy_window(self):
            CALLS.append(("destroy_window", None))
            self.window_open = False

    @staticmethod
    def draw_geometries(geometries, **kw):
        CALLS.append(("draw_geometries", len(list(geometries))))


geometry = _geometry
utility = _utility
visualization = _visualization
