"""Permutohedral-lattice hash encoding core: TPU-tuned lattice math + gather.

Split out of :mod:`neural_graph_mapping_tpu.ops.encodings` so the hot math can
be layout-tuned independently of the module interface. Two TPU-specific
choices (measured on v5e):

1. **Points-minor layout.** All lattice arithmetic runs on ``(L, d+1, P)``
   tensors (points in the 128-lane minor dimension) with the tiny d+1 = 4 and
   level axes unrolled/static. The naive ``(P, L, 4)`` layout leaves 96% of
   VPU lanes idle and measured ~27 ms for 400k lattice embeddings; this
   layout is ~100x better.

2. **Scatter-free backward.** XLA's TPU scatter-add for the hash-table
   gradient (1.5M updates into a 2^12-entry table) measures ~27 ms because it
   serializes. The custom VJP instead decomposes the one-hot index matrix as
   ``onehot(idx) = onehot(idx >> 6) x onehot(idx & 63)`` and contracts with
   two dense einsums — turning the scatter into MXU matmuls. Gradients w.r.t.
   the barycentric weights are exact, so point-gradients (eikonal etc.) flow
   through standard autodiff of the lattice math; gradients w.r.t. the
   discrete indices are (correctly) zero.

Lattice algorithm: Adams, Baek, Davis, "Fast High-Dimensional Filtering Using
the Permutohedral Lattice" (CGF 2010). Replaces the reference's CUDA
``permutohedral_encoding`` extension (reference positional_encodings.py:19-66).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Large primes for spatial hashing (instant-ngp style).
HASH_PRIMES = (1, 2654435761, 805459861, 3674653429)


def lattice_keys_and_weights(
    points: jnp.ndarray,  # (P, d)
    scales: jnp.ndarray,  # (L,)
    shifts: jnp.ndarray,  # (L, d)
    elev_scale: jnp.ndarray,  # (d,)
    capacity: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Simplex corner hash indices and barycentric weights, points-minor.

    Returns:
        idx: (L, d+1, P) int32 hash-table indices per level and corner.
        w: (L, d+1, P) barycentric weights (sum to 1 over corners).
    """
    d = points.shape[-1]
    L = scales.shape[0]

    x = points.T[None, :, :] / scales[:, None, None] + shifts[:, :, None]  # (L, d, P)
    cf = x * elev_scale[None, :, None]  # (L, d, P)

    # Elevate onto the sum-zero hyperplane H_d:
    # elevated[0] = sum_i cf[i]; elevated[i] = sum_{j>=i} cf[j] - i*cf[i-1].
    cfs = [cf[:, i] for i in range(d)]  # each (L, P)
    suffix = [None] * (d + 1)
    suffix[d] = jnp.zeros_like(cfs[0])
    for i in range(d - 1, -1, -1):
        suffix[i] = suffix[i + 1] + cfs[i]
    elevated = [suffix[0]] + [suffix[i] - i * cfs[i - 1] for i in range(1, d + 1)]
    # elevated: list of d+1 tensors (L, P)

    down = 1.0 / (d + 1)
    rem0 = [jnp.round(e * down) * (d + 1) for e in elevated]
    diff = [e - r for e, r in zip(elevated, rem0)]

    # rank[i] = #{j: diff[j] > diff[i]} with ties broken towards lower index
    rank = [jnp.zeros_like(diff[0], dtype=jnp.int32) for _ in range(d + 1)]
    for i in range(d + 1):
        for j in range(i + 1, d + 1):
            i_smaller = diff[i] < diff[j]
            rank[i] = rank[i] + i_smaller.astype(jnp.int32)
            rank[j] = rank[j] + (~i_smaller).astype(jnp.int32)

    # Fix points rounded off the hyperplane.
    s = sum(rem0) * down  # (L, P), integral-valued float
    s = jnp.round(s).astype(jnp.int32)
    for i in range(d + 1):
        r = rank[i] + s
        low = r < 0
        high = r > d
        rank[i] = r + jnp.where(low, d + 1, 0) - jnp.where(high, d + 1, 0)
        rem0[i] = rem0[i] + jnp.where(low, float(d + 1), 0.0) - jnp.where(
            high, float(d + 1), 0.0
        )

    # Barycentric weights: bary[d - rank[i]] += v_i; bary[d + 1 - rank[i]] -= v_i
    v = [(e - r) * down for e, r in zip(elevated, rem0)]
    bary = [jnp.zeros_like(v[0]) for _ in range(d + 2)]
    for i in range(d + 1):
        for b in range(d + 2):
            hit_hi = (d - rank[i]) == b
            hit_lo = (d + 1 - rank[i]) == b
            bary[b] = bary[b] + jnp.where(hit_hi, v[i], 0.0) - jnp.where(hit_lo, v[i], 0.0)
    bary[0] = bary[0] + 1.0 + bary[d + 1]
    w = jnp.stack(bary[: d + 1], axis=1)  # (L, d+1, P)

    # Hash the d+1 simplex corners: key_k[i] = rem0[i] + canonical[k][rank[i]],
    # canonical[k][r] = k if r < d+1-k else k-(d+1). Only first d coords hashed.
    idx_corners = []
    for k in range(d + 1):
        h = jnp.zeros_like(rank[0], dtype=jnp.uint32)
        for i in range(d):
            offset = jnp.where(rank[i] < (d + 1 - k), k, k - (d + 1))
            key_i = rem0[i].astype(jnp.int32) + offset
            h = h ^ (key_i.astype(jnp.uint32) * jnp.uint32(HASH_PRIMES[i]))
        idx_corners.append((h & jnp.uint32(capacity - 1)).astype(jnp.int32))
    idx = jnp.stack(idx_corners, axis=1)  # (L, d+1, P)
    return idx, w


# ---------------------------------------------------------------------------
# Gather + blend with scatter-free custom VJP
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=())
def gather_blend(table: jnp.ndarray, idx: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """out[l, p, f] = sum_k table[l, idx[l, k, p], f] * w[l, k, p].

    Args:
        table: (L, T, F) hash tables.
        idx: (L, K, P) int32 indices (K = d+1 corners).
        w: (L, K, P) blend weights.

    Returns:
        (L, P, F) blended features.
    """
    return _gather_blend_fwd_impl(table, idx, w)


def _gather_blend_fwd_impl(table, idx, w):
    def per_level(tab_l, idx_l, w_l):  # (T,F), (K,P), (K,P)
        feats = jnp.take(tab_l, idx_l, axis=0)  # (K, P, F)
        return jnp.einsum("kpf,kp->pf", feats, w_l)

    return jax.vmap(per_level)(table, idx, w)


def _gather_blend_fwd(table, idx, w):
    return _gather_blend_fwd_impl(table, idx, w), (table, idx, w)


def _gather_blend_bwd(res, g):
    table, idx, w = res
    L, T, F = table.shape
    K = idx.shape[1]

    # grad wrt w: exact — d out / d w[l,k,p] = table[l, idx[l,k,p], :] . g[l,p,:]
    def per_level_w(tab_l, idx_l, g_l):
        feats = jnp.take(tab_l, idx_l, axis=0)  # (K, P, F)
        return jnp.einsum("kpf,pf->kp", feats, g_l)

    grad_w = jax.vmap(per_level_w)(table, idx, g)

    # grad wrt table: scatter-free via decomposed one-hot matmuls.
    # onehot(t)[m] = onehot_hi(t >> bits_lo)[m] * onehot_lo(t & mask)[m]
    bits_lo = max(1, (T.bit_length() - 1) // 2)
    n_lo = 1 << bits_lo
    n_hi = (T + n_lo - 1) // n_lo

    def per_level_t(idx_l, w_l, g_l):
        m_idx = idx_l.reshape(-1)  # (M,) with M = K*P
        hi = (m_idx >> bits_lo).astype(jnp.int32)
        lo = (m_idx & (n_lo - 1)).astype(jnp.int32)
        # G[m, f] = w * g
        gmat = (w_l.reshape(-1, 1) * jnp.repeat(g_l[None], K, axis=0).reshape(-1, F))
        hi_oh = jax.nn.one_hot(hi, n_hi, dtype=gmat.dtype)  # (M, H)
        lo_oh = jax.nn.one_hot(lo, n_lo, dtype=gmat.dtype)  # (M, Lo)
        u = hi_oh[:, :, None] * gmat[:, None, :]  # (M, H, F)
        out = jnp.einsum("ml,mhf->lhf", lo_oh, u)  # (Lo, H, F)
        return out.transpose(1, 0, 2).reshape(n_hi * n_lo, F)[:T]

    grad_table = jax.vmap(per_level_t)(idx, w, g)
    return grad_table, None, grad_w


gather_blend.defvjp(_gather_blend_fwd, _gather_blend_bwd)


def make_elevation_scale(d: int) -> np.ndarray:
    """Column normalization of the elevation basis E (times d+1 so the
    effective lattice spacing matches the per-level scale)."""
    import math

    return np.asarray(
        [1.0 / math.sqrt((i + 1) * (i + 2)) for i in range(d)], dtype=np.float32
    ) * (d + 1)
