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
        got = permuto_pallas.gather_pairs(table, idx)
        want = jnp.stack(
            [jnp.take_along_axis(table[:, f, :], idx, axis=1) for f in range(2)],
            axis=1,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_multi_leading_dims(self):
        key = jax.random.PRNGKey(1)
        table = jax.random.normal(key, (2, 4, 2, 128))
        idx = jax.random.randint(key, (2, 4, 300), 0, 128)
        got = permuto_pallas.gather_pairs(table, idx)
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
        got = permuto_pallas.table_grad(idx, gv, t)
        want = np.zeros((b, 2, t), np.float32)
        idx_np, gv_np = np.asarray(idx), np.asarray(gv)
        for i in range(b):
            for f in range(2):
                np.add.at(want[i, f], idx_np[i], gv_np[i, f])
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_zero_gradients(self):
        idx = jnp.zeros((1, 64), jnp.int32)
        gv = jnp.zeros((1, 2, 64))
        out = permuto_pallas.table_grad(idx, gv, 128)
        assert float(jnp.abs(out).max()) == 0.0
