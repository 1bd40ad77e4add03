"""Multi-device (8 virtual CPU devices, see conftest.py) sharding tests.

Covers the field-axis scale-out design (SURVEY.md section 2c — the reference
is strictly single-device, run_mapping.py:124):

1. the standalone sharded train step (what ``__graft_entry__.dryrun_multichip``
   runs) — params/Adam sharded over a 1-D "field" mesh, one optimization step
   executes and keeps the sharding;
2. the REAL engine: ``NeuralGraphMap`` with ``num_field_shards=8`` maps a
   synthetic sequence through the fused ``frame_step`` program with sharded
   params/Adam, and produces the same losses as the unsharded engine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_graph_mapping_tpu.mapping import optimizer
from neural_graph_mapping_tpu.parallel import sharding as shd

N_DEV = 8


def _require_devices():
    if len(jax.devices()) < N_DEV:
        pytest.skip(f"needs {N_DEV} devices, have {len(jax.devices())}")


def _make_fieldset():
    from neural_graph_mapping_tpu.models.fields import NeuralFieldSet

    return NeuralFieldSet(
        dim_points=3,
        field_type="neural_graph_mapping_tpu.models.fields.NeuralField",
        field_kwargs=dict(
            encoding_type="neural_graph_mapping_tpu.ops.encodings.PermutohedralEncoding",
            encoding_kwargs=dict(
                pos_dim=3, log2_hashmap_size=6, nr_levels=4, nr_feat_per_level=2,
                coarsest_scale=1.0, finest_scale=0.01, init_scale=1e-5,
            ),
            num_layers=1, dim_out=4,
        ),
        num_knn=2, distance_factor=10.0, outside_value=1.0,
        field_radius=1.0, scale_mode="unit_cube",
    )


def test_sharded_train_step_runs_and_stays_sharded():
    _require_devices()
    from neural_graph_mapping_tpu.ops import losses as losses_mod
    from neural_graph_mapping_tpu.ops import quadrature

    mesh = shd.make_field_mesh(N_DEV)
    fset = _make_fieldset()
    num_fields, rays, samples = 2 * N_DEV, 8, 6
    params = shd.shard_field_pytree(
        fset.init_fields(jax.random.PRNGKey(0), num_fields), mesh
    )
    adam0 = optimizer.init_adam_state(params)
    fshard = shd.field_sharding(mesh)
    adam = optimizer.AdamState(
        m=shd.shard_field_pytree(adam0.m, mesh),
        v=shd.shard_field_pytree(adam0.v, mesh),
        steps=jax.device_put(adam0.steps, fshard),
    )
    ocfg = optimizer.AdamConfig()

    key = jax.random.PRNGKey(1)
    positions = jax.device_put(jax.random.normal(key, (num_fields, 3)) * 3.0, fshard)
    orientations = jax.device_put(
        jnp.tile(jnp.asarray([1.0, 0.0, 0.0, 0.0]), (num_fields, 1)), fshard
    )
    distances = jnp.sort(
        jax.random.uniform(key, (num_fields, rays, samples), minval=0.5, maxval=3.0),
        axis=-1,
    )
    dirs = jax.random.normal(key, (num_fields, rays, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    points = jax.device_put(
        positions[:, None, None, :] + dirs[..., None, :] * (distances[..., None] - 1.5),
        fshard,
    )
    target_rgb = jax.device_put(jax.random.uniform(key, (num_fields, rays, 3)), fshard)
    target_depth = jax.device_put(distances[..., samples // 2], fshard)
    distances = jax.device_put(distances, fshard)
    field_ids = jax.device_put(jnp.arange(num_fields), fshard)
    field_valid = jax.device_put(jnp.ones((num_fields,), bool), fshard)

    @jax.jit
    def train_step(params, adam, points, distances, target_rgb, target_depth):
        sub = fset.gather_fields(params, field_ids)

        def loss_fn(sp):
            f, r, s, _ = points.shape
            outs = fset.apply_vmap(
                sp, points.reshape(f, r * s, 3), positions, orientations
            ).reshape(f, r, s, 4)
            q = quadrature.quadrature(
                "nrgbd", outs[..., :3], outs[..., 3], distances, distances,
                geometry_factor=20.0,
            )
            return losses_mod.photometric_loss(
                "l1", target_rgb, q.colors
            ) + losses_mod.depth_loss("huber", target_depth, q.depths)

        loss, grads = jax.value_and_grad(loss_fn)(sub)
        new_params, new_adam = optimizer.adam_slice_update(
            ocfg, params, adam, field_ids, field_valid, grads, sub
        )
        return new_params, new_adam, loss

    with mesh:
        new_params, new_adam, loss = train_step(
            params, adam, points, distances, target_rgb, target_depth
        )
        jax.block_until_ready(new_params)
    assert jnp.isfinite(loss)
    assert float(jnp.abs(new_params["w0"] - params["w0"]).max()) > 0.0
    # the update preserved the field-axis sharding (no silent replication)
    spec = new_params["w0"].sharding.spec
    assert spec[0] == shd.FIELD_AXIS


def _run_engine(num_field_shards: int, frames: int = 6):
    from neural_graph_mapping_tpu.datasets.synthetic import SyntheticDataset
    from neural_graph_mapping_tpu.mapping.engine import NeuralGraphMap

    ds = SyntheticDataset({"num_frames": frames, "width": 40, "height": 30,
                           "fx": 35.0, "fy": 35.0})
    ds.load_slam_results()
    config = {
        "model_kwargs": {
            "dim_points": 3,
            "field_type": "neural_graph_mapping_tpu.models.fields.NeuralField",
            "field_kwargs": {
                "encoding_type": (
                    "neural_graph_mapping_tpu.ops.encodings.PermutohedralEncoding"
                ),
                "encoding_kwargs": {
                    "pos_dim": 3, "log2_hashmap_size": 6, "nr_levels": 4,
                    "nr_feat_per_level": 2, "coarsest_scale": 1.0,
                    "finest_scale": 0.01, "init_scale": 1e-5,
                },
                "num_layers": 1, "dim_out": 4,
            },
            "num_knn": 2, "distance_factor": 10.0, "field_radius": 1.0,
            "scale_mode": "unit_cube", "outside_value": 1.0,
        },
        "field_radius": 1.0,
        "num_train_fields": 8,
        "num_rays_per_field": 32,
        "num_samples_coarse": 4,
        "num_samples_depth_guided": 4,
        "num_iterations_per_frame": 2,
        "num_kf_slots": 32,
        "max_new_fields": 64,
        "num_field_shards": num_field_shards,
        "seed": 3,
    }
    ngm = NeuralGraphMap(config)
    losses = []
    for fid in range(len(ds)):
        losses.append(ngm.process_frame(ds, fid, jnp.asarray(ds[fid]["rgbd"])))
    return ngm, losses


def test_engine_frame_step_sharded_matches_unsharded():
    _require_devices()
    ngm_s, losses_s = _run_engine(num_field_shards=N_DEV)
    assert ngm_s.num_fields > 0
    # the big state is actually sharded over the field mesh
    assert ngm_s._params["w0"].sharding.spec[0] == shd.FIELD_AXIS
    assert ngm_s._adam.m["w0"].sharding.spec[0] == shd.FIELD_AXIS
    finals = [d for d in losses_s if d]
    assert finals, "no optimization iterations ran"
    assert all(np.isfinite(d["combined"]) for d in finals)

    # same seeds, same program semantics: unsharded run must agree closely
    ngm_u, losses_u = _run_engine(num_field_shards=1)
    assert ngm_u.num_fields == ngm_s.num_fields
    for ds_, du_ in zip(losses_s, losses_u):
        for k in du_:
            assert abs(ds_[k] - du_[k]) < 1e-3 + 1e-2 * abs(du_[k]), (
                k, ds_[k], du_[k]
            )


def test_sharded_frame_step_hlo_has_no_big_allgather():
    """Design regression (VERDICT r2 item 9): in the sharded engine program,
    the big per-field state (params + Adam moments over the FULL field
    capacity) must stay field-sharded through gather -> update -> scatter.
    An accidental resharding shows up as an all-gather whose output is a
    full-capacity leaf; assert the compiled HLO contains none."""
    import re

    _require_devices()
    from neural_graph_mapping_tpu.mapping import engine as eng

    ngm, _ = _run_engine(num_field_shards=N_DEV, frames=3)
    assert ngm.num_fields > 0
    cache_c2w = jnp.asarray(ngm._cache_c2w_np)
    cache_valid = jnp.asarray(ngm._cache_valid_np)
    lowered = eng.optimization_iterations_scan.lower(
        ngm._fset, ngm._camera, ngm._rcfg, ngm._ocfg, ngm._loss_cfg,
        ngm._num_train_fields, ngm._num_iterations_per_frame,
        ngm._params, ngm._adam, ngm._map_arrays.training_iterations,
        ngm._map_arrays.positions, ngm._map_arrays.orientations,
        ngm._allocated_mask(), ngm._observed_mask,
        ngm._cache_rgb, ngm._cache_depth, cache_c2w, cache_valid,
        jax.random.PRNGKey(0),
    )
    hlo = lowered.compile().as_text()

    # big = any full-capacity per-field leaf (the smallest is w1: cap x in x 4;
    # the table is far larger). Gathering the ACTIVE train slice is fine.
    cap = ngm.capacity
    table_elems = int(np.prod(ngm._params["enc.table"].shape))
    active_slice_elems = (
        ngm._num_train_fields * table_elems // cap
    )
    threshold = 2 * active_slice_elems

    offenders = []
    for line in hlo.splitlines():
        if "all-gather" not in line:
            continue
        m = re.search(r"=\s*\(?[a-z0-9]+\[([0-9,]*)\]", line)
        if not m:
            continue
        dims = [int(d) for d in m.group(1).split(",") if d]
        elems = int(np.prod(dims)) if dims else 1
        if elems > threshold:
            offenders.append(line.strip()[:160])
    assert not offenders, (
        f"all-gather of full per-field state found (> {threshold} elements):\n"
        + "\n".join(offenders)
    )


def test_render_points_sharded_matches_unsharded():
    """Field-sharded KNN rendering (render_points_sharded): global routing +
    per-shard tiled evaluation + one psum must reproduce the single-device
    tiled blend on an 8-device mesh."""
    _require_devices()
    fset = _make_fieldset()
    n = 16  # multiple of the mesh size
    params = fset.init_fields(jax.random.PRNGKey(0), n)
    positions = jax.random.normal(jax.random.PRNGKey(1), (n, 3)) * 2.0
    orientations = jax.random.normal(jax.random.PRNGKey(2), (n, 4))
    orientations = orientations / jnp.linalg.norm(
        orientations, axis=-1, keepdims=True
    )
    valid = jnp.arange(n) < 13  # padded/invalid tail entries
    pts = jax.random.normal(jax.random.PRNGKey(3), (300, 3)) * 2.5

    want = fset.apply_knn_tiled(
        params, pts, positions, orientations, valid, interpret=True
    )
    mesh = shd.make_field_mesh(N_DEV)
    got = shd.render_points_sharded(
        fset, params, positions, orientations, valid, pts, mesh,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4
    )


def test_render_points_sharded_hlo_no_param_allgather():
    """The sharded render's only cross-device traffic should be the
    (P, dim_out) psum of blend contributions — the per-field hash tables
    must never be all-gathered."""
    import re

    _require_devices()
    fset = _make_fieldset()
    n = 16
    params = fset.init_fields(jax.random.PRNGKey(0), n)
    positions = jax.random.normal(jax.random.PRNGKey(1), (n, 3)) * 2.0
    orientations = jnp.tile(jnp.asarray([1.0, 0.0, 0.0, 0.0]), (n, 1))
    valid = jnp.ones((n,), bool)
    pts = jax.random.normal(jax.random.PRNGKey(3), (256, 3)) * 2.5
    mesh = shd.make_field_mesh(N_DEV)

    lowered = jax.jit(
        lambda p, pos, orient, v, q: shd.render_points_sharded(
            fset, p, pos, orient, v, q, mesh, interpret=True
        )
    ).lower(params, positions, orientations, valid, pts)
    hlo = lowered.compile().as_text()

    # threshold: derived from the ACTUAL table so a full-table all-gather
    # always flags (a fixed constant here was measured vacuous — the whole
    # enc.table is 8192 elements); legitimate traffic (the (P, dim_out)
    # psum, replicated point broadcasts) is far smaller
    table_elems = int(np.prod(params["enc.table"].shape))
    threshold = table_elems // 2
    offenders = []
    for line in hlo.splitlines():
        if "all-gather" not in line:
            continue
        m = re.search(r"=\s*\(?[a-z0-9]+\[([0-9,]*)\]", line)
        if not m:
            continue
        dims = [int(d) for d in m.group(1).split(",") if d]
        elems = int(np.prod(dims)) if dims else 1
        if elems > threshold:
            offenders.append(line.strip()[:160])
    assert not offenders, (
        "all-gather of per-field state in the sharded render:\n"
        + "\n".join(offenders)
    )
