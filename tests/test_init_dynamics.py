"""Pin the reference-parity initialization regime (round-5 cross-check).

The reference defaults initial_geometry_bias to 0.0 (its yaml + models.py:77):
under the nrgbd bell 4*s(g)*s(-g) with geometry_factor 20, a fresh field then
starts near occupancy 1, term_prob ~1 — so the depth/rgb losses (masked by
pred term_prob > 0.8, reference run_mapping.py:1787) are LIVE from iteration
0. Rounds 1-4 shipped bias 1.0 (transparent untrained space), which silently
put initial occupancy at the sigmoid tail (~4e-7): supervision stayed dark
for dozens of frames and cost 8.4 dB PSNR at the reference's own online
budget (r5 cross-check, STATUS.md). These tests keep that regression from
coming back.
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from neural_graph_mapping_tpu import config as config_mod
from neural_graph_mapping_tpu.models.fields import NeuralField
from neural_graph_mapping_tpu.ops import quadrature

REPO = pathlib.Path(__file__).resolve().parents[1]


def _default_config():
    return config_mod.load_config(
        "neural_graph_map.yaml", search_paths=[str(REPO / "config")]
    )


def test_default_geometry_bias_is_reference_parity():
    config = _default_config()
    fk = config["model_kwargs"]["field_kwargs"]
    assert float(fk["initial_geometry_bias"]) == 0.0


def test_fresh_field_supervision_is_live():
    """A freshly initialized field must produce term_prob > 0.8 on nearly all
    rays so the masked depth/rgb losses receive gradients at iteration 0."""
    config = _default_config()
    fk = dict(config["model_kwargs"]["field_kwargs"])
    fk["encoding_type"] = fk["encoding_type"].replace(
        "neural_graph_mapping.positional_encodings",
        "neural_graph_mapping_tpu.ops.encodings",
    )
    field = NeuralField(**fk)
    gf = float(config["geometry_factor"])

    n_rays, n_samples = 64, 24
    key = jax.random.PRNGKey(0)
    kp, kq = jax.random.split(key)
    params = field.init(kp)
    # local points inside the unit field sphere, n_samples per ray
    pts = jax.random.uniform(kq, (n_rays * n_samples, 3), minval=-0.5, maxval=0.5)
    out = field.apply(params, pts)
    geometry = out[..., -1].reshape(n_rays, n_samples)

    distances = jnp.broadcast_to(
        jnp.linspace(0.5, 1.5, n_samples)[None, :], geometry.shape
    )
    colors = jnp.zeros((n_rays, n_samples, 3))
    q = quadrature.quadrature(
        "nrgbd", colors, geometry, distances, distances, geometry_factor=gf
    )
    term_probs = np.asarray(q.term_probs)
    # occupancy starts near the bell peak -> rays saturate within ~24 samples
    assert (term_probs > 0.8).mean() > 0.95, term_probs.mean()
