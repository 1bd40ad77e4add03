"""Tests for block-wise mesh extraction with an analytic field stub."""

import jax.numpy as jnp
import numpy as np

from neural_graph_mapping_tpu.mapping import meshing


class AnalyticSphereFieldSet:
    """Duck-typed field set: geometry = SDF of a unit sphere at origin,
    color = position-derived RGB. Mirrors the NeuralFieldSet.apply_knn
    signature used by extract_mesh."""

    def apply_knn(self, params, points, positions, orientations, valid,
                  capacity, field_radius=None, num_knn=None,
                  with_stats=False):
        r = jnp.linalg.norm(points, axis=-1)
        sdf = r - 1.0
        color = 0.5 + 0.5 * points / jnp.maximum(r[:, None], 1e-6)
        out = jnp.concatenate([color, sdf[:, None]], axis=-1)
        return (out, jnp.int32(0)) if with_stats else out


class TestExtractMesh:
    def test_sphere_extraction(self, tmp_path):
        fset = AnalyticSphereFieldSet()
        positions = jnp.zeros((1, 3))
        orientations = jnp.asarray([[1.0, 0, 0, 0]])
        valid = jnp.ones(1, bool)
        mesh = meshing.extract_mesh(
            fset, {}, positions, orientations, valid,
            field_radius=1.5, geometry_mode="nrgbd", geometry_factor=1.0,
            resolution=0.1, block_size=32,
            mesh_file_path=tmp_path / "sphere.ply",
        )
        assert mesh is not None
        r = np.linalg.norm(mesh.vertices, axis=1)
        assert abs(r.mean() - 1.0) < 0.05
        assert mesh.vertex_colors is not None
        assert (tmp_path / "sphere.ply").is_file()
        assert (tmp_path / "sphere_fields.txt").is_file()

    def test_multi_block_consistency(self):
        """Extraction split across several blocks still covers the surface."""
        fset = AnalyticSphereFieldSet()
        positions = jnp.zeros((1, 3))
        orientations = jnp.asarray([[1.0, 0, 0, 0]])
        valid = jnp.ones(1, bool)
        mesh = meshing.extract_mesh(
            fset, {}, positions, orientations, valid,
            field_radius=1.5, geometry_mode="nrgbd", geometry_factor=1.0,
            resolution=0.1, block_size=16,  # forces multiple blocks
        )
        r = np.linalg.norm(mesh.vertices, axis=1)
        assert abs(r.mean() - 1.0) < 0.05
        # surface covers all octants
        for dim in range(3):
            assert mesh.vertices[:, dim].max() > 0.8
            assert mesh.vertices[:, dim].min() < -0.8

    def test_occupancy_isolevel_convention(self):
        """occupancy mode: logit > 0 inside -> surface at logit == 0."""
        class OccupancyFieldSet:
            def apply_knn(self, params, points, positions, orientations, valid,
                          capacity, field_radius=None, num_knn=None,
                          with_stats=False):
                logit = 5.0 * (1.0 - jnp.linalg.norm(points, axis=-1))  # + inside
                color = jnp.full(points.shape[:-1] + (3,), 0.5)
                out = jnp.concatenate([color, logit[:, None]], axis=-1)
                return (out, jnp.int32(0)) if with_stats else out

        mesh = meshing.extract_mesh(
            OccupancyFieldSet(), {}, jnp.zeros((1, 3)),
            jnp.asarray([[1.0, 0, 0, 0]]), jnp.ones(1, bool),
            field_radius=1.5, geometry_mode="occupancy", geometry_factor=1.0,
            resolution=0.1, block_size=32,
        )
        r = np.linalg.norm(mesh.vertices, axis=1)
        assert abs(r.mean() - 1.0) < 0.05

    def test_no_fields_returns_none(self):
        out = meshing.extract_mesh(
            AnalyticSphereFieldSet(), {}, jnp.zeros((4, 3)),
            jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (4, 1)), jnp.zeros(4, bool),
            field_radius=1.0, geometry_mode="nrgbd", geometry_factor=1.0,
        )
        assert out is None
