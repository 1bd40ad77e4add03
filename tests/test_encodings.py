"""Tests for positional encodings, including permutohedral lattice properties."""

import jax
import jax.numpy as jnp
import numpy as np

from neural_graph_mapping_tpu.ops import encodings


def make_permuto(**overrides):
    kwargs = dict(
        pos_dim=3,
        log2_hashmap_size=10,
        nr_levels=4,
        nr_feat_per_level=2,
        coarsest_scale=1.0,
        finest_scale=0.01,
    )
    kwargs.update(overrides)
    return encodings.PermutohedralEncoding(**kwargs)


class TestPermutohedral:
    def test_out_dim(self):
        enc = make_permuto()
        assert enc.get_out_dim() == 8
        enc2 = make_permuto(concat_points=True)
        assert enc2.get_out_dim() == 11

    def test_init_shapes_and_scale(self):
        enc = make_permuto(init_scale=1e-5)
        params = enc.init(jax.random.PRNGKey(0))
        assert params["table"].shape == (2, 4, 1024)  # (F, L, T) feature-major
        assert float(jnp.abs(params["table"]).max()) <= 1e-5

    def test_barycentric_weights_sum_to_one(self):
        enc = make_permuto()
        pts = jax.random.normal(jax.random.PRNGKey(1), (256, 3))
        idx, w = enc._lattice_keys_and_weights(pts)
        assert idx.shape == (4, 4, 256) and w.shape == (4, 4, 256)
        sums = np.asarray(jnp.sum(w, axis=1))  # sum over the d+1 corners
        np.testing.assert_allclose(sums, 1.0, atol=1e-4)
        assert np.asarray(w).min() >= -1e-4  # weights are (nearly) nonneg
        assert np.asarray(idx).min() >= 0 and np.asarray(idx).max() < 1024

    def test_continuity(self):
        """Encoding should be continuous: nearby points -> nearby features."""
        enc = make_permuto()
        params = enc.init(jax.random.PRNGKey(2))
        params = {"table": params["table"] * 1e5}  # boost signal
        p0 = jnp.asarray([[0.123, -0.456, 0.789]])
        eps = 1e-5
        f0 = enc.apply(params, p0)
        f1 = enc.apply(params, p0 + eps)
        assert float(jnp.abs(f1 - f0).max()) < 1e-2

    def test_distinguishes_points_at_fine_scales(self):
        enc = make_permuto()
        params = enc.init(jax.random.PRNGKey(3))
        params = {"table": params["table"] * 1e5}
        f_a = enc.apply(params, jnp.asarray([[0.0, 0.0, 0.0]]))
        f_b = enc.apply(params, jnp.asarray([[0.3, 0.1, -0.2]]))
        assert float(jnp.abs(f_a - f_b).max()) > 1e-4

    def test_vmap_over_fields(self):
        enc = make_permuto()
        keys = jax.random.split(jax.random.PRNGKey(4), 3)
        stacked = jax.vmap(enc.init)(keys)
        assert stacked["table"].shape == (3, 2, 4, 1024)
        pts = jax.random.normal(jax.random.PRNGKey(5), (3, 16, 3))
        out = jax.vmap(enc.apply)(stacked, pts)
        assert out.shape == (3, 16, 8)
        # different tables -> different outputs
        assert float(jnp.abs(out[0] - out[1]).max()) > 0

    def test_grad_flows_to_table(self):
        enc = make_permuto()
        params = enc.init(jax.random.PRNGKey(6))
        pts = jax.random.normal(jax.random.PRNGKey(7), (32, 3))

        def loss(p):
            return jnp.sum(enc.apply(p, pts) ** 2)

        g = jax.grad(loss)(params)
        assert g["table"].shape == params["table"].shape
        assert float(jnp.abs(g["table"]).sum()) > 0

    def test_concat_points(self):
        enc = make_permuto(concat_points=True, concat_points_scaling=2.0)
        params = enc.init(jax.random.PRNGKey(8))
        pts = jnp.asarray([[0.1, 0.2, 0.3]])
        out = enc.apply(params, pts)
        np.testing.assert_allclose(np.asarray(out[0, -3:]), [0.2, 0.4, 0.6], atol=1e-6)


class TestNeRFEncoding:
    def test_matches_closed_form(self):
        enc = encodings.PositionalEncodingNeRF(dim_in=2, num_octaves=3)
        assert enc.get_out_dim() == 12
        pts = jnp.asarray([[0.25, -0.5]])
        out = np.asarray(enc.apply({}, pts))[0]
        mult = (2.0 ** np.arange(3)) * np.pi
        scaled = np.asarray(pts)[0][:, None] * mult
        want = np.concatenate([np.sin(scaled).reshape(-1), np.cos(scaled).reshape(-1)])
        np.testing.assert_allclose(out, want, atol=1e-6)


class TestFourierEncoding:
    def test_shapes_and_raw_coords(self):
        enc = encodings.PositionalEncodingFourier(3, 16, 0.0, 1.0, raw_coords=True)
        params = enc.init(jax.random.PRNGKey(0))
        assert params["fourier_w"].shape == (3, 13)
        out = enc.apply(params, jnp.ones((5, 3)))
        assert out.shape == (5, 16)
        np.testing.assert_allclose(np.asarray(out[:, :3]), 1.0)


class TestTriplane:
    def test_modes_and_shapes(self):
        for mode, dim in [("sum", 8), ("product", 8), ("concat", 24)]:
            enc = encodings.TriplaneEncoding(resolution=16, num_components=8, mode=mode)
            assert enc.get_out_dim() == dim
            params = enc.init(jax.random.PRNGKey(1))
            out = enc.apply(params, jnp.zeros((7, 3)))
            assert out.shape == (7, dim)

    def test_bilinear_interpolation_exact_at_grid_points(self):
        enc = encodings.TriplaneEncoding(resolution=3, num_components=1, mode="sum")
        planes = jnp.arange(3 * 1 * 3 * 3, dtype=jnp.float32).reshape(3, 1, 3, 3)
        # corner (-1, -1, -1) -> index [0, 0] of each plane
        out = enc.apply({"planes": planes}, jnp.asarray([[-1.0, -1.0, -1.0]]))
        want = planes[0, 0, 0, 0] + planes[1, 0, 0, 0] + planes[2, 0, 0, 0]
        np.testing.assert_allclose(float(out[0, 0]), float(want), atol=1e-6)
        # center (0,0,0) -> index [1,1]
        out_c = enc.apply({"planes": planes}, jnp.asarray([[0.0, 0.0, 0.0]]))
        want_c = planes[0, 0, 1, 1] + planes[1, 0, 1, 1] + planes[2, 0, 1, 1]
        np.testing.assert_allclose(float(out_c[0, 0]), float(want_c), atol=1e-6)
