"""Pallas TPU kernel for the permutohedral hash-table gradient.

The training-path bottleneck of the whole framework is the backward pass of
the hash-encoding gather: ~25M (pair -> table-entry) gradient contributions
per optimization step must be accumulated into 32 fields x 16 levels x 2^12
table entries. XLA's TPU scatter-add serializes this (~27 ms measured at 1/16
scale on v5e); XLA sort-based segment-sum measures ~1.1 s. This kernel does it
as dense MXU matmuls instead:

    onehot(idx)  ==  onehot(idx >> 6)  (x)  onehot(idx & 63)

so the per-(field, level) table gradient is

    grad[hi, lo, f] = sum_m hi_oh[m, hi] * lo_oh[m, lo] * gval[m, f]
                    = dot(hi_oh, lo_oh * gval_f)   -- one (64, M)x(M, 64)
                                                      contraction per feature,

with the one-hot factors generated on the fly in VMEM (iota-compare against
the index tile, pairs kept in the 128-lane minor dimension) and the (64, 64)
accumulators living in registers/VMEM across tiles. No one-hot ever touches
HBM, and no scatter is emitted.

Replaces the CUDA extension's atomicAdd backward (reference external dep
``permutohedral_encoding``, /pyproject.toml:20). Specialized to F == 2
features per level — the reference config's only supported value
(positional_encodings.py:43 "Must be 2 right now").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BITS_LO = 6
N_LO = 1 << BITS_LO  # 64
TILE_M = 512


def _table_grad_kernel(idx_ref, gv_ref, out_ref, *, n_hi: int, num_tiles: int):
    """One grid step = one (field, level) pair.

    idx_ref: (1, num_tiles, TILE_M) int32 hash indices.
    gv_ref: (1, 2, num_tiles, TILE_M) f32 weighted output gradients.
    out_ref: (1, 2, T) f32 table gradient (T = n_hi * N_LO).
    """
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (n_hi, TILE_M), 0)
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (N_LO, TILE_M), 0)

    def body(t, accs):
        acc0, acc1 = accs
        idx = idx_ref[0, t, :].reshape(1, TILE_M)
        hi = idx >> BITS_LO
        lo = idx & (N_LO - 1)
        hi_oh = (hi_iota == hi).astype(jnp.float32)  # (n_hi, TILE_M)
        lo_oh = (lo_iota == lo).astype(jnp.float32)  # (N_LO, TILE_M)
        gv0 = gv_ref[0, 0, t, :].reshape(1, TILE_M)
        gv1 = gv_ref[0, 1, t, :].reshape(1, TILE_M)
        # contract over the pair (lane) dimension: (n_hi, M) x (N_LO, M)^T
        dn = (((1,), (1,)), ((), ()))
        acc0 = acc0 + jax.lax.dot_general(
            hi_oh, lo_oh * gv0, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
        acc1 = acc1 + jax.lax.dot_general(
            hi_oh, lo_oh * gv1, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
        return acc0, acc1

    init = (jnp.zeros((n_hi, N_LO), jnp.float32), jnp.zeros((n_hi, N_LO), jnp.float32))
    acc0, acc1 = jax.lax.fori_loop(0, num_tiles, body, init)
    # t = hi * N_LO + lo; flattening to (T,) happens in the wrapper (Mosaic
    # cannot shape-cast (n_hi, 64) -> (T,) in-kernel)
    out_ref[0, 0, :, :] = acc0
    out_ref[0, 1, :, :] = acc1


@functools.partial(jax.jit, static_argnames=("table_size",))
def table_grad(idx: jnp.ndarray, gvals: jnp.ndarray, table_size: int) -> jnp.ndarray:
    """Accumulate weighted gradients into hash tables, batched.

    Args:
        idx: (..., M) int32 table indices in [0, table_size).
        gvals: (..., M, 2) f32 per-pair gradient values (weight * dL/dout).
        table_size: static table capacity T (power of two, >= 64).

    Returns:
        (..., table_size, 2) f32 gradient tables.
    """
    assert gvals.shape[-1] == 2, "kernel specialized to 2 features/level"
    lead = idx.shape[:-1]
    m = idx.shape[-1]
    b = 1
    for s in lead:
        b *= s
    n_hi = table_size // N_LO

    num_tiles = (m + TILE_M - 1) // TILE_M
    pad = num_tiles * TILE_M - m
    idx_f = idx.reshape(b, m)
    gv_f = jnp.moveaxis(gvals.reshape(b, m, 2), -1, 1)  # (b, 2, m)
    if pad:
        idx_f = jnp.concatenate([idx_f, jnp.zeros((b, pad), idx.dtype)], axis=-1)
        gv_f = jnp.concatenate([gv_f, jnp.zeros((b, 2, pad), gv_f.dtype)], axis=-1)
    idx_f = idx_f.reshape(b, num_tiles, TILE_M)
    gv_f = gv_f.reshape(b, 2, num_tiles, TILE_M)

    out = pl.pallas_call(
        functools.partial(_table_grad_kernel, n_hi=n_hi, num_tiles=num_tiles),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, num_tiles, TILE_M), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 2, num_tiles, TILE_M), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 2, n_hi, N_LO), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, 2, n_hi, N_LO), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * num_tiles * TILE_M * (n_hi * N_LO) * 2,
            bytes_accessed=b * (num_tiles * TILE_M * 12 + table_size * 8),
            transcendentals=0,
        ),
    )(idx_f, gv_f)

    out = out.reshape(b, 2, table_size)
    return jnp.moveaxis(out, 1, -1).reshape(lead + (table_size, 2))
