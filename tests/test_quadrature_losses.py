"""Golden-value tests for quadrature and losses vs. hand-computed cases."""

import jax.numpy as jnp
import numpy as np

from neural_graph_mapping_tpu.ops import losses, quadrature


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


class TestQuadrature:
    def test_occupancy_single_opaque_sample(self):
        # one fully-opaque sample -> ray takes its color/depth exactly
        colors = jnp.asarray([[[0.2, 0.4, 0.6], [0.9, 0.9, 0.9]]])
        geom = jnp.asarray([[100.0, 100.0]])  # sigmoid -> 1
        dists = jnp.asarray([[1.0, 2.0]])
        depths = dists
        out = quadrature.quadrature("occupancy", colors, geom, dists, depths)
        np.testing.assert_allclose(np.asarray(out.colors[0]), [0.2, 0.4, 0.6], atol=1e-4)
        np.testing.assert_allclose(float(out.depths[0]), 1.0, atol=1e-4)
        np.testing.assert_allclose(float(out.term_probs[0]), 1.0, atol=1e-4)
        np.testing.assert_allclose(float(out.depth_vars[0]), 0.0, atol=1e-4)

    def test_occupancy_transparent_ray(self):
        colors = jnp.zeros((1, 3, 3))
        geom = jnp.full((1, 3), -100.0)  # sigmoid -> 0
        dists = jnp.asarray([[1.0, 2.0, 3.0]])
        out = quadrature.quadrature("occupancy", colors, geom, dists, dists)
        np.testing.assert_allclose(float(out.term_probs[0]), 0.0, atol=1e-4)

    def test_occupancy_hand_computed_weights(self):
        g = np.array([[0.0, 1.0, 2.0]])
        occ = sigmoid(g)
        w0 = occ[0, 0]
        w1 = occ[0, 1] * (1 - occ[0, 0])
        w2 = occ[0, 2] * (1 - occ[0, 0]) * (1 - occ[0, 1])
        colors = jnp.asarray([[[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]]])
        dists = jnp.asarray([[1.0, 2.0, 3.0]])
        out = quadrature.quadrature("occupancy", colors, jnp.asarray(g), dists, dists)
        np.testing.assert_allclose(np.asarray(out.sample_weights[0]), [w0, w1, w2], atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.colors[0]), [w0, w1, w2], atol=1e-6)
        want_depth = w0 * 1 + w1 * 2 + w2 * 3
        np.testing.assert_allclose(float(out.depths[0]), want_depth, atol=1e-6)
        want_dvar = w0 * (want_depth - 1) ** 2 + w1 * (want_depth - 2) ** 2 + w2 * (want_depth - 3) ** 2
        np.testing.assert_allclose(float(out.depth_vars[0]), want_dvar, atol=1e-6)

    def test_density_mode_matches_nerf_formula(self):
        g = np.array([[0.5, 2.0, 1.0]])
        dists = np.array([[1.0, 1.5, 2.5]])
        deltas = dists[:, 1:] - dists[:, :-1]
        occ = 1 - np.exp(-deltas * np.maximum(g[:, :-1], 0))
        w0 = occ[0, 0]
        w1 = occ[0, 1] * (1 - occ[0, 0])
        colors = jnp.ones((1, 3, 3)) * jnp.asarray([0.1, 0.5, 0.9])[None, :, None]
        out = quadrature.quadrature(
            "density", colors, jnp.asarray(g), jnp.asarray(dists), jnp.asarray(dists)
        )
        np.testing.assert_allclose(np.asarray(out.sample_weights[0]), [w0, w1], atol=1e-6)
        # density mode drops the last sample from composition
        want_color = w0 * 0.1 + w1 * 0.5
        np.testing.assert_allclose(np.asarray(out.colors[0]), want_color, atol=1e-6)

    def test_nrgbd_bell_peaks_at_zero(self):
        g = jnp.asarray([[0.0]])
        occ, drops_last = quadrature.occupancy_probs("nrgbd", g, g, 1.0)
        assert not drops_last
        np.testing.assert_allclose(float(occ[0, 0]), 1.0, atol=1e-6)
        occ_far, _ = quadrature.occupancy_probs("nrgbd", jnp.asarray([[5.0]]), g, 1.0)
        assert float(occ_far[0, 0]) < 0.05

    def test_neus_mode(self):
        # SDF decreasing through zero -> occupancy concentrated at crossing
        g = jnp.asarray([[1.0, 0.5, -0.5, -1.0]])
        dists = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
        isds = jnp.asarray([[2.0]])
        out = quadrature.quadrature(
            "neus", jnp.ones((1, 4, 3)), g, dists, dists, geometry_factor=1.0, neus_isds=isds
        )
        w = np.asarray(out.sample_weights[0])
        assert w.shape == (3,)  # neus composes over S-1 intervals
        assert w[1] == w.max()  # crossing between samples 1 and 2

    def test_geometry_factor_scales(self):
        g = jnp.asarray([[0.1]])
        occ_1, _ = quadrature.occupancy_probs("occupancy", g, g, 1.0)
        occ_20, _ = quadrature.occupancy_probs("occupancy", g, g, 20.0)
        np.testing.assert_allclose(float(occ_1[0, 0]), sigmoid(0.1), atol=1e-6)
        np.testing.assert_allclose(float(occ_20[0, 0]), sigmoid(2.0), atol=1e-6)


class TestLosses:
    def test_masked_mean_matches_boolean_indexing(self):
        vals = jnp.asarray([1.0, 2.0, 3.0, 4.0])
        mask = jnp.asarray([True, False, True, False])
        np.testing.assert_allclose(float(losses.masked_mean(vals, mask)), 2.0)

    def test_masked_mean_empty_mask(self):
        vals = jnp.asarray([1.0, 2.0])
        mask = jnp.zeros(2, dtype=bool)
        assert float(losses.masked_mean(vals, mask)) == 0.0

    def test_photometric_l1_l2(self):
        a = jnp.asarray([[0.0, 0.0, 0.0]])
        b = jnp.asarray([[0.3, 0.3, 0.3]])
        np.testing.assert_allclose(float(losses.photometric_loss("l1", a, b)), 0.3, atol=1e-6)
        np.testing.assert_allclose(float(losses.photometric_loss("l2", a, b)), 0.09, atol=1e-6)

    def test_photometric_mask_broadcast(self):
        a = jnp.zeros((4, 3))
        b = jnp.ones((4, 3))
        mask = jnp.asarray([True, True, False, False])
        got = losses.photometric_loss("l1", a, b, mask=mask)
        np.testing.assert_allclose(float(got), 1.0, atol=1e-6)

    def test_huber_matches_torch_definition(self):
        r = jnp.asarray([0.01, 0.1])
        h = losses.huber(r, 0.05)
        np.testing.assert_allclose(float(h[0]), 0.5 * 0.01**2, atol=1e-8)
        np.testing.assert_allclose(float(h[1]), 0.05 * (0.1 - 0.025), atol=1e-8)

    def test_depth_huber(self):
        got = losses.depth_loss("huber", jnp.asarray([1.0]), jnp.asarray([1.01]))
        np.testing.assert_allclose(float(got), 0.5 * 0.01**2, atol=1e-8)

    def test_depth_gaussian_nll(self):
        md = jnp.asarray([1.0])
        rd = jnp.asarray([1.5])
        var = jnp.asarray([0.25])
        got = losses.depth_loss("gaussian_nll", md, rd, var)
        want = 0.5 * 0.25 / 0.25 + 0.5 * np.log(0.25)
        np.testing.assert_allclose(float(got), want, atol=1e-5)

    def test_termination_loss(self):
        got = losses.termination_loss(
            jnp.asarray([0.9, 0.1]), jnp.asarray([1.0, 0.0]), jnp.asarray([True, True])
        )
        np.testing.assert_allclose(float(got), 0.01, atol=1e-6)

    def test_freespace_loss_zero_when_predicting_truncation(self):
        # freespace samples should predict +1 (g * trunc == trunc)
        g = jnp.asarray([1.0, 1.0])
        got = losses.freespace_loss(g, 0.1, jnp.asarray([True, True]))
        np.testing.assert_allclose(float(got), 0.0, atol=1e-8)
        g_bad = jnp.asarray([0.0])
        got_bad = losses.freespace_loss(g_bad, 0.1, jnp.asarray([True]))
        np.testing.assert_allclose(float(got_bad), 0.01, atol=1e-8)

    def test_tsdf_loss(self):
        # g * trunc should equal delta = gt_dist - sample_dist
        g = jnp.asarray([0.5])
        deltas = jnp.asarray([0.05])
        got = losses.tsdf_loss(g, deltas, 0.1, jnp.asarray([True]))
        np.testing.assert_allclose(float(got), 0.0, atol=1e-8)

    def test_eikonal(self):
        grads = jnp.asarray([[1.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
        got = losses.eikonal_term(grads)
        np.testing.assert_allclose(float(got), 0.5, atol=1e-6)

    def test_eikonal_through_field_point_gradients(self):
        """geometry_gradients (the reference's autograd.grad replay,
        losses.py:78-96) differentiates the real field; FD cross-check on the
        smooth Fourier encoding, finite+nonzero on the permutohedral path."""
        import jax

        from neural_graph_mapping_tpu.models.fields import NeuralField

        field = NeuralField(
            encoding_type="neural_graph_mapping_tpu.ops.encodings.PositionalEncodingNeRF",
            encoding_kwargs=dict(dim_in=3, num_octaves=4),
            num_layers=1,
            dim_out=4,
        )
        params = field.init(jax.random.PRNGKey(3))
        pts = jax.random.uniform(jax.random.PRNGKey(4), (5, 3), minval=-0.4, maxval=0.4)
        grads = field.geometry_gradients(params, pts)
        assert grads.shape == (5, 3)
        def hidden_signs(p):
            enc_params = {
                k.split(".", 1)[1]: v for k, v in params.items() if k.startswith("enc.")
            }
            h = field.encoding.apply(enc_params, p) @ params["w0"] + params["b0"]
            return np.sign(np.asarray(h))

        eps = 1e-3
        for axis in range(3):
            step = jnp.zeros((1, 3)).at[0, axis].set(eps)
            fd = (
                field.apply(params, pts + step)[:, -1]
                - field.apply(params, pts - step)[:, -1]
            ) / (2 * eps)
            # central differences are only valid where no relu kink lies
            # inside the stencil; compare on those points only
            smooth = np.all(
                hidden_signs(pts + step) == hidden_signs(pts - step), axis=-1
            )
            assert smooth.sum() >= 3, "stencil crossed relu kinks on most points"
            np.testing.assert_allclose(
                np.asarray(grads[:, axis])[smooth],
                np.asarray(fd)[smooth],
                rtol=2e-2,
                atol=5e-3,
            )
        loss = losses.eikonal_term(grads)
        assert np.isfinite(float(loss))

        # permutohedral (piecewise-linear): gradients exist a.e. and are nonzero
        from tests.test_fields import FIELD_KWARGS

        pfield = NeuralField(**FIELD_KWARGS)
        pparams = pfield.init(jax.random.PRNGKey(5))
        pgrads = pfield.geometry_gradients(pparams, pts)
        assert np.all(np.isfinite(np.asarray(pgrads)))
        assert float(jnp.abs(pgrads).max()) > 0.0
