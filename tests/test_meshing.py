"""Surface meshing tests: marching tetrahedra on analytic SDFs, point-cloud
shell meshing, TSDF fusion on the synthetic scan, mesh PLY I/O.

Replaces what the reference delegated to Open3D Poisson
(src/mapper/mapping.py:121-137) — here the mesh path must work with zero
optional dependencies.
"""

import os

import numpy as np
import pytest

from tpu3dlm.data.ply import load_ply_mesh, save_ply_mesh
from tpu3dlm.mapper.meshing import (
    density_field,
    marching_tetrahedra,
    mesh_point_cloud,
    mesh_scan,
    tsdf_from_scan,
)


class TestMarchingTetrahedra:
    def _sphere_field(self, n=24, R=0.3, voxel=0.05):
        # signed field: positive inside the sphere
        ax = np.arange(n) * voxel
        X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
        c = (n - 1) * voxel / 2
        r = np.sqrt((X - c) ** 2 + (Y - c) ** 2 + (Z - c) ** 2)
        return (R - r).astype(np.float32), np.zeros(3, np.float32), voxel, c, R

    def test_sphere_surface_radius(self):
        field, origin, voxel, c, R = self._sphere_field()
        verts, faces = marching_tetrahedra(field, 0.0, origin, voxel)
        assert len(faces) > 100
        r = np.linalg.norm(verts - c, axis=1)
        # every surface vertex lies on the sphere to sub-voxel accuracy
        np.testing.assert_allclose(r, R, atol=voxel)

    def test_sphere_watertight(self):
        """Every edge of the welded sphere mesh is shared by exactly 2
        triangles (closed 2-manifold — the tet tiling is consistent)."""
        field, origin, voxel, *_ = self._sphere_field()
        verts, faces = marching_tetrahedra(field, 0.0, origin, voxel)
        edges = np.concatenate(
            [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]
        )
        edges = np.sort(edges, axis=1)
        _, counts = np.unique(edges, axis=0, return_counts=True)
        assert (counts == 2).all()

    def test_sphere_winding_coherent(self):
        """Faces are wound coherently: with normals_toward_positive the
        right-hand-rule normal of (essentially) every face points toward
        the field>iso side (sphere interior here → inward), and the signed
        volume matches the analytic sphere. Regression: complementary tet
        cases used to emit opposite-facing triangles (54% outward on this
        exact field), so culling/normals/signed volume were garbage."""
        field, origin, voxel, c, R = self._sphere_field()
        verts, faces = marching_tetrahedra(field, 0.0, origin, voxel)
        p0, p1, p2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
        n = np.cross(p1 - p0, p2 - p0)
        toward_center = c - (p0 + p1 + p2) / 3.0  # toward field>0 interior
        agree = (np.einsum("ij,ij->i", n, toward_center) > 0).mean()
        assert agree > 0.99, agree
        # signed volume (divergence theorem); normals point INTO the
        # enclosed positive region → negative of the enclosed volume
        vol = np.einsum("ij,ij->i", p0, np.cross(p1, p2)).sum() / 6.0
        np.testing.assert_allclose(abs(vol), 4 / 3 * np.pi * R**3, rtol=0.05)

    def test_empty_when_no_crossing(self):
        field = np.full((4, 4, 4), -1.0, np.float32)
        verts, faces = marching_tetrahedra(field, 0.0, np.zeros(3), 0.1)
        assert len(verts) == 0 and len(faces) == 0

    def test_plane_field(self):
        """Linear field crossing at z = 0.25 → planar mesh at that height."""
        n, voxel = 8, 0.1
        ax = np.arange(n) * voxel
        Z = np.meshgrid(ax, ax, ax, indexing="ij")[2]
        field = (0.25 - Z).astype(np.float32)
        verts, faces = marching_tetrahedra(field, 0.0, np.zeros(3), voxel)
        assert len(faces) > 0
        np.testing.assert_allclose(verts[:, 2], 0.25, atol=1e-5)


class TestPointCloudMesh:
    def test_wall_cloud_shell(self, rng):
        pts = np.stack(
            [
                rng.uniform(-1, 1, 4000),
                rng.uniform(-0.6, 0.6, 4000),
                np.full(4000, 2.0),
            ],
            axis=1,
        ).astype(np.float32)
        verts, faces = mesh_point_cloud(pts, voxel=0.05)
        assert len(faces) > 100
        # shell hugs the plane z=2 within ~2 voxels
        assert np.abs(verts[:, 2] - 2.0).max() < 0.11

    def test_density_field_mass(self, rng):
        pts = rng.uniform(0, 1, size=(500, 3)).astype(np.float32)
        field, origin, voxel = density_field(pts, voxel=0.1)
        # trilinear splat conserves total mass
        np.testing.assert_allclose(field.sum(), 500.0, rtol=1e-4)
        assert (origin <= pts.min(axis=0)).all()
        assert voxel == 0.1  # no downsizing at this extent

    def test_density_field_reports_effective_voxel(self, rng):
        """When max_voxels forces voxel enlargement the EFFECTIVE voxel is
        returned — meshing the grid with the caller's original voxel put
        the mesh at the wrong scale (reproduced: 3.27 m mesh from a 4 m
        cloud)."""
        pts = rng.uniform(0, 4.0, size=(3000, 3)).astype(np.float32)
        field, origin, voxel = density_field(pts, voxel=0.04, max_voxels=200_000)
        assert voxel > 0.04
        # grid at the effective voxel spans the padded cloud bounds
        span = (np.asarray(field.shape) - 1) * voxel
        extent = pts.max(axis=0) - pts.min(axis=0)
        assert (span >= extent).all()
        from tpu3dlm.mapper.meshing import marching_tetrahedra

        nz = field[field > 0]
        iso = float(np.quantile(nz, 0.35))
        verts, faces = marching_tetrahedra(
            field, iso, origin, voxel, normals_toward_positive=False
        )
        mesh_extent = verts.max(axis=0) - verts.min(axis=0)
        np.testing.assert_allclose(mesh_extent, extent, rtol=0.12)

    def test_empty_cloud_meshes_empty(self):
        verts, faces = mesh_point_cloud(np.zeros((0, 3), np.float32))
        assert len(verts) == 0 and len(faces) == 0


class TestMeshIO:
    def test_roundtrip(self, tmp_path):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
        faces = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int32)
        path = os.path.join(tmp_path, "mesh.ply")
        save_ply_mesh(path, verts, faces, colors=np.ones((4, 3)) * 0.5)
        v2, f2 = load_ply_mesh(path)
        np.testing.assert_allclose(v2, verts)
        np.testing.assert_array_equal(f2, faces)


class TestTSDF:
    @pytest.fixture(scope="class")
    def scan(self, tmp_path_factory):
        from tpu3dlm.data import synthetic
        from tpu3dlm.data.dataset import load_scan

        root = str(tmp_path_factory.mktemp("tsdf_scan"))
        synthetic.generate_scan(root, "gold_std", num_frames=4)
        base = os.path.join(root, "gold_std", "rtabmap_extract")
        return load_scan(
            image_dir=os.path.join(base, "data_rgb"),
            depth_image_dir=os.path.join(base, "data_depth"),
            calibration_dir=os.path.join(base, "calibration"),
            pose_path=os.path.join(root, "gold_std", "poses.txt"),
            img_size=128,
        )

    def test_tsdf_zero_crossing_at_wall(self, scan):
        from tpu3dlm.data.synthetic import default_signs

        field, origin, voxel = tsdf_from_scan(scan, voxel=0.08)
        verts, faces = marching_tetrahedra(field, 0.0, origin, voxel)
        assert len(faces) > 50
        # the scene is a wall at z=3 with signs slightly in front (z>=2.8):
        # the fused surface must live in that z band (observation rim aside)
        zmin = min(s.z for s in default_signs()) - 2 * voxel
        core = verts[
            (verts[:, 0] > -0.5) & (verts[:, 0] < 1.5)
            & (verts[:, 1] > -0.3) & (verts[:, 1] < 0.3)
        ]
        assert len(core) > 0
        assert (core[:, 2] > zmin).mean() > 0.9
        assert core[:, 2].max() < 3.0 + 2 * voxel

    def test_mesh_scan_api(self, scan):
        verts, faces = mesh_scan(scan, voxel=0.1)
        assert verts.ndim == 2 and verts.shape[1] == 3
        assert faces.ndim == 2 and faces.shape[1] == 3
        assert len(faces) > 0


@pytest.mark.slow  # full Pipeline mesh artifacts (~4 min each on 1 core)
class TestPipelineMeshArtifact:
    @pytest.fixture(scope="class")
    def project(self, tmp_path_factory):
        from tpu3dlm.data import synthetic
        from tpu3dlm.utils.config import write_default_config

        root = str(tmp_path_factory.mktemp("meshproj"))
        cfg_path = os.path.join(root, "configs", "variables.cfg")
        write_default_config(cfg_path)
        text = open(cfg_path).read()
        for k, v in [
            ("img_size = 640", "img_size = 96"),
            ("batch_size = 64", "batch_size = 4"),
            ("num_classes = 80", "num_classes = 2"),
            ("min_points = 1000", "min_points = 50"),
            ("eps = 0.04", "eps = 0.1"),
            ("visualise = false", "visualise = true"),
            ("mesh_voxel = 0.04", "mesh_voxel = 0.08"),
        ]:
            assert k in text, k
            text = text.replace(k, v)
        open(cfg_path, "w").write(text)
        synthetic.generate_scan(
            os.path.join(root, "configs", "data"), "gold_std", num_frames=3,
            cloud_points_per_m2=800,  # artifact-structure test, not density
        )
        return cfg_path

    @pytest.mark.parametrize("source", ["cloud", "tsdf"])
    def test_map_mesh_written(self, project, source):
        """cfg.visualise now produces a real mesh artifact next to the
        cloud, from either the PLY cloud or on-device TSDF fusion."""
        from tpu3dlm.data.ply import load_ply_mesh
        from tpu3dlm.pipeline.task import Pipeline
        from tpu3dlm.utils.config import ConfigLoader

        text = open(project).read()
        open(project, "w").write(
            text.replace("mesh_source = cloud", f"mesh_source = {source}")
            if source != "cloud" else text
        )
        cfg = ConfigLoader(project, "gold_std")
        assert cfg.mesh_source == source
        Pipeline("gold_std", cfg).run()
        out = os.path.join(os.path.dirname(cfg.ply_path), "map_mesh.ply")
        verts, faces = load_ply_mesh(out)
        assert len(faces) > 50, (source, len(faces))
        # surface sits in the scene's z band
        assert 2.5 < float(np.median(verts[:, 2])) < 3.2


class TestPoissonReconstruction:
    """FFT spectral Poisson mesher (mapper/poisson.py) — the device-side
    replacement for the reference's Open3D screened Poisson
    (src/mapper/mapping.py:121-137)."""

    def _noisy_sphere(self, n=8000, noise=0.005, seed=0):
        rng = np.random.RandomState(seed)
        d = rng.randn(n, 3)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        pts = (d + rng.randn(n, 3) * noise).astype(np.float32)
        # sensor at the centre → normals toward it
        return pts, (-d).astype(np.float32)

    def test_next_fast_len(self):
        from tpu3dlm.mapper.poisson import next_fast_len

        assert [next_fast_len(n) for n in [1, 2, 3, 7, 11, 17, 97, 101, 257]] == [
            1, 2, 3, 8, 12, 18, 100, 108, 270,
        ]
        for n in range(1, 300):
            m = next_fast_len(n)
            assert m >= n
            while m % 2 == 0:
                m //= 2
            while m % 3 == 0:
                m //= 3
            while m % 5 == 0:
                m //= 5
            assert m == 1

    def test_sphere_radius_and_winding(self):
        """A noisy sphere reconstructs to its radius, with every face wound
        outward toward the sensor side (χ < iso = free space)."""
        from tpu3dlm.mapper.poisson import mesh_poisson

        pts, normals = self._noisy_sphere()
        verts, faces = mesh_poisson(pts, normals, voxel=0.08)
        assert len(faces) > 500
        r = np.linalg.norm(verts, axis=1)
        assert abs(float(r.mean()) - 1.0) < 0.02
        assert float(np.quantile(np.abs(r - 1.0), 0.95)) < 0.08  # ≤ 1 voxel
        tri = verts[faces]
        fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        fn /= np.maximum(np.linalg.norm(fn, axis=1, keepdims=True), 1e-9)
        cent = tri.mean(axis=1)
        cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-9)
        # solid is OUTSIDE the shell (normals pointed inward) → faces wind
        # toward the centre
        assert float(((fn * cent).sum(axis=1) < 0).mean()) > 0.99

    def test_estimated_normals_match_given(self):
        """The no-normals path (grid-PCA + viewpoint orientation) lands on
        the same surface."""
        from tpu3dlm.mapper.poisson import mesh_poisson

        pts, _ = self._noisy_sphere()
        verts, faces = mesh_poisson(pts, None, voxel=0.08,
                                    viewpoint=np.zeros(3, np.float32))
        assert len(faces) > 500
        r = np.linalg.norm(verts, axis=1)
        assert abs(float(r.mean()) - 1.0) < 0.02

    @pytest.mark.slow  # dense Poisson quality gate
    def test_synthetic_cloud_two_sided_distance(self, scan_cloud):
        """On the synthetic scan's wall cloud: the mesh hugs the samples and
        covers them (both directions ≤ ~2 voxels mean), and the open-sheet
        rim halo is culled (no vertex further than ~4 voxels)."""
        from tpu3dlm.mapper.poisson import mesh_poisson

        pts = scan_cloud
        voxel = 0.1
        verts, faces = mesh_poisson(pts, voxel=voxel)
        assert len(faces) > 1000
        rs = np.random.RandomState(0)
        vi = rs.choice(len(verts), min(2000, len(verts)), replace=False)
        d_vc = np.sqrt(
            ((verts[vi][:, None] - pts[None, ::7]) ** 2).sum(-1)
        ).min(axis=1)
        assert float(d_vc.mean()) < 2 * voxel
        assert float(d_vc.max()) < 5 * voxel
        pi = rs.choice(len(pts), min(2000, len(pts)), replace=False)
        d_cv = np.sqrt(
            ((pts[pi][:, None] - verts[None]) ** 2).sum(-1)
        ).min(axis=1)
        assert float(d_cv.mean()) < 2 * voxel

    def test_empty_cloud(self):
        from tpu3dlm.mapper.poisson import mesh_poisson

        verts, faces = mesh_poisson(np.zeros((0, 3), np.float32))
        assert len(verts) == 0 and len(faces) == 0

    def test_mapping_make_mesh_poisson(self, tmp_path, scan_cloud_project):
        """Mapping.make_mesh(mesher="poisson") writes a loadable mesh PLY
        (the cfg `mesher` knob's target)."""
        import pandas as pd

        from tpu3dlm.mapper.mapping import Mapping

        cfg_path, ply_path = scan_cloud_project
        pose = pd.DataFrame(
            {"timestamp": [0.0], "tx": [0.0], "ty": [0.0], "tz": [0.0],
             "qx": [0.0], "qy": [0.0], "qz": [0.0], "qw": [1.0]}
        )
        mapper = Mapping(
            global_bboxes_data={}, optimised_bboxes={}, pose=pose,
            ply_filepath=ply_path, preprocess_point_cloud=False,
        )
        out = str(tmp_path / "poisson_mesh.ply")
        verts, faces = mapper.make_mesh(output_path=out, voxel=0.1, mesher="poisson")
        rv, rf = load_ply_mesh(out)
        assert len(rf) == len(faces) > 500


@pytest.fixture(scope="module")
def scan_cloud(tmp_path_factory):
    from tpu3dlm.data import synthetic
    from tpu3dlm.data.ply import load_ply

    root = str(tmp_path_factory.mktemp("poisson_scan"))
    synthetic.generate_scan(root, "gold_std", num_frames=3)
    pts, _ = load_ply(os.path.join(root, "gold_std", "cloud.ply"))
    return pts


@pytest.fixture(scope="module")
def scan_cloud_project(tmp_path_factory):
    from tpu3dlm.data import synthetic

    root = str(tmp_path_factory.mktemp("poisson_proj"))
    synthetic.generate_scan(root, "gold_std", num_frames=3)
    return None, os.path.join(root, "gold_std", "cloud.ply")
