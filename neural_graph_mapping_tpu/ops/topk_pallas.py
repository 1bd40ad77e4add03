"""Fused top-2-nearest-fields Pallas kernel for the render dispatch.

The jnp path (ops/dispatch.topk_fields) materializes the (P, N) squared
distance matrix in HBM (P=4.2M points x N=128 fields x 4 B = 2.1 GB per
8192-ray render block) and re-reads it for each of the k argmin passes —
traced at ~28 ms per block (multiply_reduce 13 ms + two argmin whiles 14 ms),
the second-largest op in full-image rendering. This kernel streams point
tiles through VMEM: one small MXU matmul per 128-field chunk produces the
chunk's scores on-chip, top-2 (value, index) reduce in-register, and only
(4, P) results ever touch HBM — ~120 MB of traffic instead of ~8 GB.

Replaces ``pytorch3d.ops.knn_points`` (reference models.py:361-366) on the
k=2 render path; other k fall back to the jnp implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_LANE = 128
TILE_P = 2048
_BIG = 3.0e38  # python float: jnp scalars would be captured consts in the kernel


def _top2_chunk(scores, base):
    """Per-lane top-2 over the sublane (field) axis of (N_LANE, S) scores."""
    iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
    m0 = jnp.min(scores, axis=0)
    # smallest index attaining the min (ties -> first, like argmin)
    i0 = jnp.min(jnp.where(scores == m0[None, :], iota, N_LANE), axis=0)
    masked = jnp.where(iota == i0[None, :], _BIG, scores)
    m1 = jnp.min(masked, axis=0)
    i1 = jnp.min(jnp.where(masked == m1[None, :], iota, N_LANE), axis=0)
    return m0, i0 + base, m1, i1 + base


def _lex_less(v1, i1, v2, i2):
    """(value, index) lexicographic less-than — argmin's first-tie rule."""
    return (v1 < v2) | ((v1 == v2) & (i1 < i2))


def _merge_top2(a, b):
    """Merge two per-lane (m0, i0, m1, i1) candidate sets."""
    am0, ai0, am1, ai1 = a
    bm0, bi0, bm1, bi1 = b
    first_b = _lex_less(bm0, bi0, am0, ai0)
    n0 = jnp.where(first_b, bm0, am0)
    ni0 = jnp.where(first_b, bi0, ai0)
    loser = jnp.where(first_b, am0, bm0)
    loser_i = jnp.where(first_b, ai0, bi0)
    a_sec = _lex_less(am1, ai1, bm1, bi1)
    sec = jnp.where(a_sec, am1, bm1)
    sec_i = jnp.where(a_sec, ai1, bi1)
    take_loser = _lex_less(loser, loser_i, sec, sec_i)
    n1 = jnp.where(take_loser, loser, sec)
    ni1 = jnp.where(take_loser, loser_i, sec_i)
    return n0, ni0, n1, ni1


def _topk2_kernel(pts_ref, cen_ref, csq_ref, outd_ref, outi_ref, *, n_chunks):
    pts = pts_ref[...]  # (3, TILE_P)
    p_sq = pts[0] * pts[0] + pts[1] * pts[1] + pts[2] * pts[2]  # (TILE_P,)
    best = None
    for c in range(n_chunks):
        cen = cen_ref[c]  # (N_LANE, 3)
        # scores = |c|^2 - 2 c.p  (the per-point |p|^2 is rank-invariant);
        # invalid/padded fields carry |c|^2 = +BIG via csq
        # HIGHEST: default MXU precision truncates f32 operands to bf16, and
        # the |c|^2 - 2c.p + |p|^2 reconstruction cancels catastrophically at
        # small distances (ADVICE r4); the (N,3)x(3,P) matmul is tiny.
        cross = jax.lax.dot_general(
            cen, pts, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (N_LANE, TILE_P)
        scores = csq_ref[c][:, None] - 2.0 * cross
        cand = _top2_chunk(scores, c * N_LANE)
        best = cand if best is None else _merge_top2(best, cand)
    m0, i0, m1, i1 = best
    d0 = jnp.sqrt(jnp.maximum(m0 + p_sq, 0.0))
    d1 = jnp.sqrt(jnp.maximum(m1 + p_sq, 0.0))
    # re-inject inf for invalid winners (m >= BIG/2 only when every candidate
    # in the chunk was padded/invalid)
    inf = jnp.float32(jnp.inf)
    outd_ref[0] = jnp.where(m0 > _BIG * 0.25, inf, d0)
    outd_ref[1] = jnp.where(m1 > _BIG * 0.25, inf, d1)
    outi_ref[0] = i0
    outi_ref[1] = i1


@functools.partial(jax.jit, static_argnames=("interpret",))
def topk2_fields(
    points_fm: jnp.ndarray,  # (3, P) feature-major points
    centers: jnp.ndarray,  # (N, 3)
    valid: jnp.ndarray,  # (N,) bool
    interpret: bool = False,
):
    """Top-2 nearest valid field centers per point.

    Returns (dists (2, P) f32 with inf for invalid, idx (2, P) int32) —
    feature-major to match the streaming layout; callers transpose if they
    need (P, 2). Matches dispatch.topk_fields(k=2) semantics: distances are
    euclidean, ties resolve to the lower field index, indices of inf lanes
    are in-range.
    """
    _, p = points_fm.shape
    n = centers.shape[0]
    n_pad = (-n) % N_LANE
    n_chunks = (n + n_pad) // N_LANE
    cen = jnp.concatenate(
        [centers.astype(jnp.float32), jnp.zeros((n_pad, 3), jnp.float32)], 0
    )
    c_sq = jnp.sum(cen * cen, axis=-1)
    c_sq = jnp.where(
        jnp.concatenate([valid, jnp.zeros((n_pad,), bool)]), c_sq, _BIG
    )
    p_pad = (-p) % TILE_P
    pts = points_fm.astype(jnp.float32)
    if p_pad:
        pts = jnp.concatenate([pts, jnp.zeros((3, p_pad), jnp.float32)], -1)
    pt = p + p_pad
    num_tiles = pt // TILE_P

    outd, outi = pl.pallas_call(
        functools.partial(_topk2_kernel, n_chunks=n_chunks),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((3, TILE_P), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (n_chunks, N_LANE, 3), lambda t: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n_chunks, N_LANE), lambda t: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((2, TILE_P), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, TILE_P), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, pt), jnp.float32),
            jax.ShapeDtypeStruct((2, pt), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=pt * n_chunks * N_LANE * 8,
            bytes_accessed=pt * (3 + 4) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pts, cen.reshape(n_chunks, N_LANE, 3), c_sq.reshape(n_chunks, N_LANE))
    return outd[:, :p], jnp.minimum(outi[:, :p], n - 1)
