"""Interpret-mode tests for the Pallas TPU kernels (run on CPU).

``pl.pallas_call(..., interpret=True)`` executes the kernels with the Pallas
interpreter, so the MXU one-hot-matmul lookup and the histogram gradient are
covered by CI without TPU hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_graph_mapping_tpu.ops import permuto_pallas


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    # the modules capture `pl` at import; patch their reference too
    monkeypatch.setattr(permuto_pallas.pl, "pallas_call", interp_call)
    yield


class TestGatherPairs:
    def test_matches_take(self):
        key = jax.random.PRNGKey(0)
        b, t, m = 3, 256, 700  # m not a multiple of the tile size
        table = jax.random.normal(key, (b, 2, t))
        idx = jax.random.randint(key, (b, m), 0, t)
        got = permuto_pallas.gather_pairs(table, idx, mxu_dtype=jnp.float32)
        want = jnp.stack(
            [jnp.take_along_axis(table[:, f, :], idx, axis=1) for f in range(2)],
            axis=1,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_matches_take_bf16_default(self):
        """Production default (bf16 MXU operands): exact one-hots, table
        values quantized to bf16 -> relative error bounded by 2^-8."""
        key = jax.random.PRNGKey(0)
        b, t, m = 3, 256, 700
        table = jax.random.normal(key, (b, 2, t))
        idx = jax.random.randint(key, (b, m), 0, t)
        got = permuto_pallas.gather_pairs(table, idx)
        want = jnp.stack(
            [jnp.take_along_axis(table[:, f, :], idx, axis=1) for f in range(2)],
            axis=1,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2**-8, atol=1e-6
        )

    def test_multi_leading_dims(self):
        key = jax.random.PRNGKey(1)
        table = jax.random.normal(key, (2, 4, 2, 128))
        idx = jax.random.randint(key, (2, 4, 300), 0, 128)
        got = permuto_pallas.gather_pairs(table, idx, mxu_dtype=jnp.float32)
        assert got.shape == (2, 4, 2, 300)
        # spot check one entry
        np.testing.assert_allclose(
            float(got[1, 2, 0, 17]), float(table[1, 2, 0, idx[1, 2, 17]]), atol=1e-5
        )


class TestTableGrad:
    def test_matches_scatter_add(self):
        key = jax.random.PRNGKey(2)
        b, t, m = 2, 128, 500
        idx = jax.random.randint(key, (b, m), 0, t)
        gv = jax.random.normal(key, (b, 2, m))
        got = permuto_pallas.table_grad(idx, gv, t, mxu_dtype=jnp.float32)
        want = np.zeros((b, 2, t), np.float32)
        idx_np, gv_np = np.asarray(idx), np.asarray(gv)
        for i in range(b):
            for f in range(2):
                np.add.at(want[i, f], idx_np[i], gv_np[i, f])
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
        # production default (bf16 gradient operands): same histogram up to
        # per-value bf16 quantization
        got_bf = permuto_pallas.table_grad(idx, gv, t)
        np.testing.assert_allclose(np.asarray(got_bf), want, rtol=2**-7, atol=0.05)

    def test_zero_gradients(self):
        idx = jnp.zeros((1, 64), jnp.int32)
        gv = jnp.zeros((1, 2, 64))
        out = permuto_pallas.table_grad(idx, gv, 128)
        assert float(jnp.abs(out).max()) == 0.0


def _enc(levels=4, log2_t=8):
    from neural_graph_mapping_tpu.ops.encodings import PermutohedralEncoding

    return PermutohedralEncoding(
        pos_dim=3, log2_hashmap_size=log2_t, nr_levels=levels,
        nr_feat_per_level=2, coarsest_scale=1.0, finest_scale=0.01,
        init_scale=1e-2,
    )


def _jnp_encode(enc, table, coords):
    """Reference path: jnp lattice + gather_blend (the CPU production path)."""
    from neural_graph_mapping_tpu.ops import permuto

    idx, w = permuto.lattice_keys_and_weights_soa(
        tuple(coords[i] for i in range(3)),
        jnp.asarray(enc.scales), enc._shifts, enc._elev_scale, enc.capacity,
    )
    return permuto.gather_blend(table, idx, w), (idx, w)


class TestEncodeFused:
    """encode_fwd / encode_bwd_table (the TPU production hot path since the
    fused-encode commit) must match the jnp lattice + gather_blend path that
    the 148 CPU tests exercise — guards against drift between the duplicated
    lattice math in permuto_pallas._lattice_tile and permuto.py."""

    @pytest.mark.parametrize("p", [700, 1024, 1500])  # un/even vs TILE_M
    def test_fwd_matches_jnp_path(self, p):
        enc = _enc()
        key = jax.random.PRNGKey(3)
        k1, k2 = jax.random.split(key)
        table = enc.init(k1)["table"]  # (2, L, T) feature-major
        coords = jax.random.uniform(k2, (3, p), minval=-1.5, maxval=1.5)
        got = permuto_pallas.encode_fwd(
            table, coords, enc._scales_t, enc._shifts_t, enc._elev_t, enc.capacity,
            mxu_dtype=jnp.float32,
        )
        want, _ = _jnp_encode(enc, table, coords)
        assert got.shape == want.shape == (2 * enc.nr_levels, p)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
        # production default (bf16 table operand): within bf16 quantization
        got_bf = permuto_pallas.encode_fwd(
            table, coords, enc._scales_t, enc._shifts_t, enc._elev_t, enc.capacity
        )
        np.testing.assert_allclose(
            np.asarray(got_bf), np.asarray(want), atol=float(enc.init_scale) * 2**-6
        )

    def test_fwd_multi_field_leading_dims(self):
        enc = _enc(levels=3, log2_t=7)
        key = jax.random.PRNGKey(4)
        f, p = 3, 513
        tables = jax.vmap(lambda k: enc.init(k)["table"])(jax.random.split(key, f))
        coords = jax.random.uniform(key, (f, 3, p), minval=-2.0, maxval=2.0)
        got = permuto_pallas.encode_fwd(
            tables, coords, enc._scales_t, enc._shifts_t, enc._elev_t, enc.capacity,
            mxu_dtype=jnp.float32,
        )
        assert got.shape == (f, 2 * enc.nr_levels, p)
        for i in range(f):
            want, _ = _jnp_encode(enc, tables[i], coords[i])
            np.testing.assert_allclose(
                np.asarray(got[i]), np.asarray(want), atol=1e-4
            )

    @pytest.mark.parametrize("p", [700, 1500])
    def test_bwd_table_matches_autodiff(self, p):
        enc = _enc()
        key = jax.random.PRNGKey(5)
        k1, k2, k3 = jax.random.split(key, 3)
        table = enc.init(k1)["table"]
        coords = jax.random.uniform(k2, (3, p), minval=-1.5, maxval=1.5)
        g = jax.random.normal(k3, (2 * enc.nr_levels, p))

        got = permuto_pallas.encode_bwd_table(
            coords, g, enc._scales_t, enc._shifts_t, enc._elev_t, enc.capacity,
            mxu_dtype=jnp.float32,
        )
        assert got.shape == (2, enc.nr_levels, enc.capacity)

        # autodiff of the jnp path w.r.t. the table under the same cotangent
        def f(tab):
            out, _ = _jnp_encode(enc, tab, coords)
            return out

        _, vjp = jax.vjp(f, table)
        (want,) = vjp(g)  # (2, L, T)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-3, rtol=1e-4
        )
        # production default (bf16 gradient operand)
        got_bf = permuto_pallas.encode_bwd_table(
            coords, g, enc._scales_t, enc._shifts_t, enc._elev_t, enc.capacity
        )
        np.testing.assert_allclose(
            np.asarray(got_bf), np.asarray(want), rtol=2**-6, atol=0.05
        )

    def test_bwd_zero_cotangent(self):
        enc = _enc(levels=2, log2_t=6)
        coords = jnp.zeros((3, 64))
        g = jnp.zeros((2 * enc.nr_levels, 64))
        out = permuto_pallas.encode_bwd_table(
            coords, g, enc._scales_t, enc._shifts_t, enc._elev_t, enc.capacity
        )
        assert float(jnp.abs(out).max()) == 0.0


class TestEncodeMlpFused:
    """Fused encode+MLP (the whole-field kernel pair) against the already
    golden-tested Pallas primitives (encode_fwd / encode_bwd_table share the
    exact lattice math, so this isolates the NEW fusion logic): forward, full
    backward (table, w0, b0, w1, b1), and the custom_vjp under vmap as the
    field-set training path uses it. encode_fwd itself is tested against the
    jnp path above."""

    @staticmethod
    def _mlp(feats, w0, b0, w1, b1):
        a0 = jnp.einsum("dh,dp->hp", w0, feats) + b0[:, None]
        h = jnp.maximum(a0, 0.0)
        return jnp.einsum("ho,hp->op", w1, h) + b1[:, None]

    def _setup(self, p, seed=11, levels=4, log2_t=8):
        enc = _enc(levels=levels, log2_t=log2_t)
        d = 2 * enc.nr_levels
        ks = jax.random.split(jax.random.PRNGKey(seed), 6)
        table = enc.init(ks[0])["table"] * 1e4  # signal at O(0.1)
        coords = jax.random.uniform(ks[1], (3, p), minval=-1.5, maxval=1.5)
        w0 = jax.random.normal(ks[2], (d, d)) * 0.3
        b0 = jax.random.normal(ks[3], (d,)) * 0.1
        w1 = jax.random.normal(ks[4], (d, 4)) * 0.3
        b1 = jax.random.normal(ks[5], (4,)) * 0.1
        return enc, table, coords, (w0, b0, w1, b1)

    @pytest.mark.parametrize("p", [700, 1024])
    def test_fwd_matches_primitives(self, p):
        enc, table, coords, (w0, b0, w1, b1) = self._setup(p)
        out, feats = permuto_pallas.encode_mlp_fwd(
            table, w0, b0, w1, b1, coords,
            enc._scales_t, enc._shifts_t, enc._elev_t, enc.capacity,
            mxu_dtype=jnp.float32,
        )
        feats_want = permuto_pallas.encode_fwd(
            table, coords, enc._scales_t, enc._shifts_t, enc._elev_t,
            enc.capacity, mxu_dtype=jnp.float32,
        )
        want = self._mlp(feats_want, w0, b0, w1, b1)
        assert out.shape == (4, p)
        # feats is the NATIVE row-major residual; recover canonical (D, P)
        d = feats.shape[2]
        m = feats.shape[1] * 128
        feats_c = feats.transpose(0, 2, 1, 3).reshape(1, d, m)[0, :, :p]
        # identical sweep code, but the two kernels compile separately and
        # the backend contracts mul+add into FMA differently per context
        # (measured: deterministic ~1e-4-relative differences on CPU)
        np.testing.assert_allclose(
            np.asarray(feats_c), np.asarray(feats_want), rtol=1e-3, atol=1e-2
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(want), atol=1e-3, rtol=1e-2
        )

    def test_bwd_matches_primitives(self):
        enc, table, coords, (w0, b0, w1, b1) = self._setup(900, seed=12)
        g = jax.random.normal(jax.random.PRNGKey(99), (4, 900))

        _, feats = permuto_pallas.encode_mlp_fwd(
            table, w0, b0, w1, b1, coords,
            enc._scales_t, enc._shifts_t, enc._elev_t, enc.capacity,
            mxu_dtype=jnp.float32,
        )
        gt, dw0, db0, dw1, db1 = permuto_pallas.encode_mlp_bwd(
            coords, feats, g, w0, b0, w1, b1,
            enc._scales_t, enc._shifts_t, enc._elev_t, enc.capacity,
            mxu_dtype=jnp.float32,
        )

        # reference: autodiff the jnp MLP on the saved feats for the weight
        # grads + dL/dfeats, then the golden-tested table-grad kernel
        d = feats.shape[2]
        m = feats.shape[1] * 128
        feats_c = feats.transpose(0, 2, 1, 3).reshape(1, d, m)[0, :, :900]
        _, vjp = jax.vjp(
            lambda f, a, bb, c, dd: self._mlp(f, a, bb, c, dd),
            feats_c, w0, b0, w1, b1,
        )
        dfeats, ww0, wb0, ww1, wb1 = vjp(g)
        wt = permuto_pallas.encode_bwd_table(
            coords, dfeats, enc._scales_t, enc._shifts_t, enc._elev_t,
            enc.capacity, mxu_dtype=jnp.float32,
        )
        for got, want in [(gt, wt), (dw0, ww0), (db0, wb0), (dw1, ww1),
                          (db1, wb1)]:
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=1e-3, rtol=1e-3
            )

    def test_custom_vjp_under_vmap(self):
        """The field-set training path vmaps the fused custom_vjp over
        fields; value and grads must match per-field single calls."""
        from neural_graph_mapping_tpu.ops import permuto

        enc = _enc(levels=2, log2_t=6)
        d = 2 * enc.nr_levels
        f, p = 3, 300
        ks = jax.random.split(jax.random.PRNGKey(13), 6)
        tables = jax.vmap(lambda k: enc.init(k)["table"])(
            jax.random.split(ks[0], f)
        ) * 1e4
        coords = jax.random.uniform(ks[1], (f, 3, p), minval=-1.5, maxval=1.5)
        w0 = jax.random.normal(ks[2], (f, d, d)) * 0.3
        b0 = jax.random.normal(ks[3], (f, d)) * 0.1
        w1 = jax.random.normal(ks[4], (f, d, 4)) * 0.3
        b1 = jax.random.normal(ks[5], (f, 4)) * 0.1

        def call(t, a, bb, c, dd, cc):
            return permuto.encode_mlp_fused(
                t, a, bb, c, dd, cc,
                enc._scales_t, enc._shifts_t, enc._elev_t, enc.capacity,
            )

        def loss(tables, w0, b0, w1, b1):
            out = jax.vmap(call)(tables, w0, b0, w1, b1, coords)
            return jnp.sum(jnp.sin(out))

        val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(
            tables, w0, b0, w1, b1
        )

        def ref_loss(tables, w0, b0, w1, b1):
            outs = [
                call(tables[i], w0[i], b0[i], w1[i], b1[i], coords[i])
                for i in range(f)
            ]
            return jnp.sum(jnp.sin(jnp.stack(outs)))

        want_val = ref_loss(tables, w0, b0, w1, b1)
        np.testing.assert_allclose(float(val), float(want_val), rtol=1e-5)
        ref_grads = jax.grad(ref_loss, argnums=(0, 1, 2, 3, 4))(
            tables, w0, b0, w1, b1
        )
        for got, want in zip(grads, ref_grads):
            # both arms run the fused kernels (default bf16 MXU operands);
            # vmap batching changes accumulation layout -> bf16-level noise
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=5e-3, rtol=2e-2
            )
