"""Tests for mesh IO, native kernels, meshing, metrics, and culling."""

import numpy as np
import pytest

from neural_graph_mapping_tpu.eval import mesh_metrics, render_metrics
from neural_graph_mapping_tpu.ops import native
from neural_graph_mapping_tpu.utils import meshio


def make_sphere_mesh(radius=1.0, n=24):
    grid = np.arange(n, dtype=np.float32)
    x, y, z = np.meshgrid(grid, grid, grid, indexing="ij")
    c = (n - 1) / 2
    scale = 2.5 * radius / n
    sdf = np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2) * scale - radius
    verts, tris = native.marching_tetrahedra(sdf, 0.0)
    verts_w = (verts - c) * scale
    return meshio.Mesh(verts_w, tris)


class TestNative:
    def test_marching_tetrahedra_sphere(self):
        mesh = make_sphere_mesh(1.0)
        r = np.linalg.norm(mesh.vertices, axis=1)
        assert abs(r.mean() - 1.0) < 0.01
        assert r.std() < 0.01
        assert mesh.faces.max() < len(mesh.vertices)

    def test_empty_grid(self):
        verts, tris = native.marching_tetrahedra(np.ones((8, 8, 8), np.float32), 0.0)
        assert len(verts) == 0 and len(tris) == 0

    def test_rasterize_depth_zbuffer(self):
        tri = np.array([[-5, -5, 2.0], [5, -5, 2.0], [0, 8, 2.0]], np.float32)
        tris = np.array([[0, 1, 2]], np.int32)
        w2c = np.eye(4, dtype=np.float32)
        d = native.rasterize_depth(tri, tris, w2c, 60, 60, 32, 24, 64, 48)
        assert abs(d[24, 32] - 2.0) < 1e-5
        # behind-camera clipped
        tri_b = tri.copy()
        tri_b[:, 2] = -1.0
        d2 = native.rasterize_depth(tri_b, tris, w2c, 60, 60, 32, 24, 64, 48)
        assert (d2 == 0).all()

    def test_rasterize_no_pinholes_on_shared_edges(self):
        mesh = make_sphere_mesh(1.0)
        w2c = np.eye(4, dtype=np.float32)
        w2c[2, 3] = 3.0
        d = native.rasterize_depth(
            mesh.vertices, mesh.faces, w2c, 60, 60, 32, 24, 64, 48
        )
        # interior of the silhouette must be fully covered
        inner = d[20:29, 28:37]
        assert (inner > 0).all()
        assert abs(d[24, 32] - 2.0) < 0.05


class TestMeshIO:
    def test_ply_roundtrip_binary(self, tmp_path):
        mesh = make_sphere_mesh(0.5, n=12)
        mesh.vertex_colors = np.random.RandomState(0).rand(len(mesh.vertices), 3).astype(np.float32)
        path = tmp_path / "m.ply"
        meshio.save_ply(path, mesh)
        loaded = meshio.load_ply(path)
        np.testing.assert_allclose(loaded.vertices, mesh.vertices, atol=1e-6)
        np.testing.assert_array_equal(loaded.faces, mesh.faces)
        np.testing.assert_allclose(loaded.vertex_colors, mesh.vertex_colors, atol=1e-6)

    def test_ply_ascii_with_quads(self, tmp_path):
        content = """ply
format ascii 1.0
element vertex 4
property float x
property float y
property float z
element face 1
property list uchar int vertex_indices
end_header
0 0 0
1 0 0
1 1 0
0 1 0
4 0 1 2 3
"""
        path = tmp_path / "quad.ply"
        path.write_text(content)
        mesh = meshio.load_ply(path)
        assert len(mesh.vertices) == 4
        assert len(mesh.faces) == 2  # quad triangulated

    def test_sample_surface(self):
        mesh = make_sphere_mesh(1.0)
        pts, _ = mesh.sample_surface(2000)
        r = np.linalg.norm(pts, axis=1)
        assert abs(r.mean() - 1.0) < 0.02

    def test_subdivide_to_size(self):
        v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        f = np.array([[0, 1, 2]], np.int32)
        mesh = meshio.Mesh(v, f).subdivide_to_size(0.3)
        e = mesh.vertices[mesh.faces] - mesh.vertices[mesh.faces[:, [1, 2, 0]]]
        assert np.linalg.norm(e, axis=-1).max() <= 0.3 + 1e-6

    def test_simplify(self):
        mesh = make_sphere_mesh(1.0)
        simple = mesh.simplify(0.3)
        assert len(simple.vertices) < len(mesh.vertices)
        r = np.linalg.norm(simple.vertices, axis=1)
        assert abs(r.mean() - 1.0) < 0.1


class TestMeshMetrics:
    def test_identical_meshes_near_zero_error(self):
        mesh = make_sphere_mesh(1.0)
        # with finite sampling, accuracy ~= the inter-sample spacing
        m = mesh_metrics.evaluate_meshes(mesh, mesh, num_points=40000, align=False)
        assert m["accuracy"] < 0.012
        assert m["completion"] < 0.012
        assert m["f1_5cm"] > 0.99

    def test_shifted_mesh_detected(self):
        mesh = make_sphere_mesh(1.0)
        shifted = mesh.transform(
            np.array([[1, 0, 0, 0.2], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1.0]])
        )
        m = mesh_metrics.evaluate_meshes(shifted, mesh, num_points=5000, align=False)
        assert m["accuracy"] > 0.05

    def test_icp_recovers_small_offset(self):
        mesh = make_sphere_mesh(1.0, n=32)
        # aspherical bump so ICP has a unique solution? sphere is rotation
        # symmetric; translation is still observable.
        offset = np.eye(4)
        offset[:3, 3] = [0.05, -0.03, 0.02]
        shifted = mesh.transform(offset)
        aligned = mesh_metrics.align_mesh(shifted, mesh, num_points=8000)
        m = mesh_metrics.evaluate_meshes(aligned, mesh, num_points=40000, align=False)
        assert m["accuracy"] < 0.012


class TestRenderMetrics:
    def test_psnr_identical(self):
        import jax.numpy as jnp

        img = jnp.ones((32, 32, 3)) * 0.5
        assert render_metrics.psnr(img, img) > 60

    def test_psnr_known_value(self):
        import jax.numpy as jnp

        a = jnp.zeros((16, 16, 3))
        b = jnp.full((16, 16, 3), 0.1)
        np.testing.assert_allclose(render_metrics.psnr(a, b), 20.0, atol=1e-3)

    def test_ssim_bounds(self):
        import jax
        import jax.numpy as jnp

        img = jax.random.uniform(jax.random.PRNGKey(0), (64, 64, 3))
        assert render_metrics.ssim(img, img) > 0.99
        other = jax.random.uniform(jax.random.PRNGKey(1), (64, 64, 3))
        assert render_metrics.ssim(img, other) < 0.5

    def test_depthl1_masked(self):
        import jax.numpy as jnp

        target = jnp.asarray([[1.0, 0.0], [2.0, 0.0]])
        pred = jnp.asarray([[1.5, 9.0], [2.5, 9.0]])
        np.testing.assert_allclose(render_metrics.depthl1(pred, target), 0.5, atol=1e-6)

    def test_crop(self):
        import jax.numpy as jnp

        a = jnp.zeros((20, 20, 3)).at[:2].set(1.0)  # garbage at border
        b = jnp.zeros((20, 20, 3))
        assert render_metrics.psnr(a, b, crop=2) > 60

    def test_lpips_gated_without_weights(self, monkeypatch):
        import jax.numpy as jnp

        monkeypatch.delenv("NGM_LPIPS_WEIGHTS", raising=False)
        render_metrics._lpips_weights.cache_clear()
        with pytest.raises(FileNotFoundError):
            render_metrics.lpips(jnp.zeros((16, 16, 3)), jnp.zeros((16, 16, 3)))

    def test_lpips_matches_torch_reference(self, tmp_path, monkeypatch):
        """Cross-validate the jnp LPIPS pipeline against an independent torch
        implementation of torchmetrics' AlexNet-LPIPS (evaluation.py:15-17,
        33-43) with identical synthetic weights. Real pretrained weights
        (shipped via NGM_LPIPS_WEIGHTS) then drop in without code changes."""
        import jax.numpy as jnp
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(0)
        shapes = {
            "conv0_w": (8, 3, 11, 11), "conv1_w": (16, 8, 5, 5),
            "conv2_w": (24, 16, 3, 3), "conv3_w": (16, 24, 3, 3),
            "conv4_w": (16, 16, 3, 3),
        }
        arrays = {}
        for name, shape in shapes.items():
            arrays[name] = rng.normal(0, 0.2, shape).astype(np.float32)
            arrays[name.replace("_w", "_b")] = rng.normal(
                0, 0.1, shape[0]
            ).astype(np.float32)
        for i, c in enumerate([8, 16, 24, 16, 16]):
            arrays[f"lin{i}_w"] = np.abs(
                rng.normal(0, 0.2, (1, c, 1, 1))
            ).astype(np.float32)
        path = tmp_path / "lpips_test.npz"
        np.savez(path, **arrays)
        monkeypatch.setenv("NGM_LPIPS_WEIGHTS", str(path))
        render_metrics._lpips_weights.cache_clear()

        a = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)

        def torch_feats(img):
            shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
            scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
            x = torch.from_numpy(img).permute(2, 0, 1)[None]
            x = (2.0 * x - 1.0 - shift) / scale
            cfg = [(4, 2, True), (1, 2, True), (1, 1, False),
                   (1, 1, False), (1, 1, False)]
            feats = []
            for i, (stride, pad, pool) in enumerate(cfg):
                w = torch.from_numpy(arrays[f"conv{i}_w"])
                bias = torch.from_numpy(arrays[f"conv{i}_b"])
                x = F.relu(F.conv2d(x, w, bias, stride=stride, padding=pad))
                feats.append(x)
                if pool:
                    x = F.max_pool2d(x, 3, stride=2)
            return feats

        fa, fb = torch_feats(a), torch_feats(b)
        expected = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / (xa.norm(dim=1, keepdim=True) + 1e-10)
            nb = xb / (xb.norm(dim=1, keepdim=True) + 1e-10)
            lin = torch.from_numpy(arrays[f"lin{i}_w"])
            expected += ((na - nb) ** 2 * lin).sum(dim=1).mean().item()

        got = render_metrics.lpips(jnp.asarray(a), jnp.asarray(b))
        render_metrics._lpips_weights.cache_clear()
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)
        assert got > 0.0


class TestCulling:
    def test_frustum_culling_removes_behind_camera(self):
        from neural_graph_mapping_tpu.eval import culling

        class FakeDataset:
            pass

        mesh = make_sphere_mesh(0.5, n=16)

        ds = FakeDataset()
        from neural_graph_mapping_tpu.camera import Camera

        ds.camera = Camera.create(64, 48, 60.0, 60.0, 32.0, 24.0)
        # one camera at +z looking back at origin (opengl: -z forward)
        c2w = np.eye(4, dtype=np.float32)
        c2w[2, 3] = 3.0
        ds.gt_c2ws = np.stack([c2w, c2w])
        ds.custom_scene_bounds = None
        import pathlib

        ds.scene_dir_path = pathlib.Path("/nonexistent")
        FakeDataset.scene_bounds = property(lambda self: None)

        culled = culling.cull_mesh(mesh, ds, "occlusion", subdivide=False)
        # back hemisphere occluded -> fewer faces
        assert 0 < len(culled.faces) < len(mesh.faces)
        # surviving faces predominantly on the camera-facing side
        face_z = culled.vertices[culled.faces].mean(axis=1)[:, 2]
        assert (face_z > 0).mean() > 0.8
