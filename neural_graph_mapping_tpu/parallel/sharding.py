"""Multi-chip scaling: shard the field axis of the map over a device mesh.

The reference is strictly single-GPU (SURVEY.md section 2c: no distributed
anything). The natural TPU scale-out axis for neural graph mapping is the
*field* dimension: fields are independent little networks except for (a) the
k-NN blend at render time (reduces over <= num_knn neighbors) and (b) scalar
loss reductions. So:

- the stacked field params/optimizer pytrees shard their leading (field) axis
  over a 1-D mesh ("field"),
- each optimization iteration trains an aligned slice of fields per device
  (targets are sharded the same way), so the gather/scatter and Adam update
  are fully local,
- scalar losses reduce with one ``psum``-sized all-reduce inserted by XLA,
- render-time field-center top-k uses an ``all_gather`` of field centers
  (tiny: N x 3 floats) and evaluates locally-owned experts only.

All of this is expressed with ``jax.sharding.NamedSharding`` annotations on
a jitted step — XLA inserts the collectives (over ICI on real hardware).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

FIELD_AXIS = "field"


def make_field_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D device mesh over the field axis."""
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devices), (FIELD_AXIS,))


def field_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for any array whose leading axis is fields."""
    return NamedSharding(mesh, P(FIELD_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_field_pytree(tree, mesh: Mesh):
    """Place a stacked-field pytree with its leading axis sharded."""
    sharding = field_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_fields_to_mesh(tree, mesh: Mesh):
    """Pad the leading (field) axis to a multiple of the mesh size."""
    n = mesh.devices.size

    def pad(x):
        rem = (-x.shape[0]) % n
        if rem == 0:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((rem,) + x.shape[1:], x.dtype)], axis=0
        )

    return jax.tree_util.tree_map(pad, tree)


def render_points_sharded(
    fset,
    params,
    field_positions: jnp.ndarray,  # (N, 3) replicated
    field_orientations: jnp.ndarray,  # (N, 4) replicated
    field_valid: jnp.ndarray,  # (N,) replicated
    query_points: jnp.ndarray,  # (P, 3) replicated
    mesh: Mesh,
    interpret: bool = False,
) -> jnp.ndarray:
    """KNN-blended field evaluation with the FIELD axis sharded over a mesh.

    The multi-chip render design promised in the module docstring: the k-NN
    routing runs replicated on the tiny (N, 3) center table, each device
    evaluates only the (point, field) pairs whose field it owns via the same
    tile-sorted MoE dispatch as single-chip rendering
    (``NeuralFieldSet.apply_knn_tiled`` with ``routing``/``partial_blend``),
    and one ``psum`` over the field axis reconstructs the exact softmax
    blend — the blend is linear in the pairs, and pair weights come from the
    replicated GLOBAL distances, so the result is bit-comparable to the
    unsharded path. ICI traffic: one (P, dim_out) psum per block.

    ``params``/``field_positions``/... must have their field axis padded to
    a multiple of the mesh size (``pad_fields_to_mesh``); padded entries
    must be marked invalid in ``field_valid``.

    Returns (P, dim_out) blended outputs (outside points filled with
    ``fset.outside_value``).
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from neural_graph_mapping_tpu.ops import dispatch

    n = field_positions.shape[0]
    assert n % mesh.devices.size == 0, "pad the field axis to the mesh size first"
    n_local = n // mesh.devices.size
    k = fset.num_knn

    knn_dists, knn_idx = dispatch.topk_fields(
        query_points, field_positions, field_valid, k
    )  # (P, k) GLOBAL routing, replicated (centers are tiny)
    inside = knn_dists[:, 0] < fset.field_radius

    def shard_fn(local_params, local_pos, local_orient, local_valid):
        shard = jax.lax.axis_index(FIELD_AXIS)
        base = shard * n_local
        local_idx = knn_idx - base
        owned = (local_idx >= 0) & (local_idx < n_local)
        part = fset.apply_knn_tiled(
            local_params,
            query_points,
            local_pos,
            local_orient,
            local_valid,
            interpret=interpret,
            routing=(
                knn_dists,
                jnp.where(owned, local_idx, 0),
                owned,
                inside,
            ),
            partial_blend=True,
        )
        return jax.lax.psum(part, FIELD_AXIS)

    specs = dict(
        mesh=mesh,
        in_specs=(P(FIELD_AXIS), P(FIELD_AXIS), P(FIELD_AXIS), P(FIELD_AXIS)),
        out_specs=P(),
    )
    try:  # replication checking flag was renamed across jax versions
        mapped = shard_map(shard_fn, **specs, check_vma=False)
    except TypeError:
        mapped = shard_map(shard_fn, **specs, check_rep=False)
    out = mapped(params, field_positions, field_orientations, field_valid)
    return jnp.where(inside[:, None], out, fset.outside_value)
