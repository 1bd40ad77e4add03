"""Interpret-mode tests for the batched lane-gather kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_graph_mapping_tpu.ops import permuto_pallas


@pytest.mark.parametrize("b,n,m", [(3, 4800, 640), (2, 128, 50), (1, 300, 1024)])
def test_matches_take_along_axis(b, n, m):
    key = jax.random.PRNGKey(0)
    values = jax.random.normal(key, (b, n))
    idx = jax.random.randint(jax.random.PRNGKey(1), (b, m), 0, n)
    got = permuto_pallas.batched_gather(values, idx, interpret=True)
    want = jnp.take_along_axis(values, idx, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)
