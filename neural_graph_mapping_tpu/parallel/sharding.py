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
