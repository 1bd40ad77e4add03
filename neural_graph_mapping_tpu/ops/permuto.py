"""Permutohedral-lattice hash encoding core: TPU-tuned lattice math + gather.

Split out of :mod:`neural_graph_mapping_tpu.ops.encodings` so the hot math can
be layout-tuned independently of the module interface. Three TPU-specific
choices (measured on v5e):

1. **Points-minor layout.** All lattice arithmetic runs on ``(L, d+1, P)``
   tensors (points in the 128-lane minor dimension) with the tiny d+1 = 4 and
   level axes unrolled/static. The naive ``(P, L, 4)`` layout leaves 96% of
   VPU lanes idle (~27 ms for 400k lattice embeddings; this layout ~100x
   less).

2. **Feature-major tables.** Hash tables are stored ``(F, L, T)`` — features
   MAJOR, table index minor — so neither the forward gather nor the backward
   histogram ever needs a minor-dimension-2 transpose. (A single
   ``moveaxis(..., -1, 1)`` on the gradient values measured **35 ms** on v5e;
   the entire backward kernel without it is ~0.1 ms.)

3. **Scatter-free backward.** XLA's TPU scatter-add for the hash-table
   gradient serializes (~27 ms at 1/16 of the training shape), and XLA sort
   measures ~1.1 s. The Pallas kernel in
   :mod:`neural_graph_mapping_tpu.ops.permuto_pallas` instead decomposes
   ``onehot(idx) = onehot(idx >> 6) (x) onehot(idx & 63)`` and accumulates
   with MXU matmuls, one-hots generated in VMEM.

Gradients w.r.t. the barycentric weights are exact, so point-gradients
(eikonal etc.) flow through standard autodiff of the lattice math; gradients
w.r.t. the discrete indices are (correctly) zero.

Lattice algorithm: Adams, Baek, Davis, "Fast High-Dimensional Filtering Using
the Permutohedral Lattice" (CGF 2010). Replaces the reference's CUDA
``permutohedral_encoding`` extension (reference positional_encodings.py:19-66,
pinned in /pyproject.toml:20).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Large primes for spatial hashing (instant-ngp style).
HASH_PRIMES = (1, 2654435761, 805459861, 3674653429)


def make_elevation_scale(d: int) -> np.ndarray:
    """Column normalization of the elevation basis E (times d+1 so the
    effective lattice spacing matches the per-level scale)."""
    return np.asarray(
        [1.0 / math.sqrt((i + 1) * (i + 2)) for i in range(d)], dtype=np.float32
    ) * (d + 1)


def normalize_capacities(capacity, n_levels: int) -> Tuple[int, ...]:
    """An int capacity (uniform) or per-level tuple -> per-level tuple."""
    if isinstance(capacity, (int, np.integer)):
        return (int(capacity),) * n_levels
    caps = tuple(int(c) for c in capacity)
    assert len(caps) == n_levels
    return caps


def count_lattice_cells(
    scale: float, shifts_row, elev_scale, domain: float = 1.3, max_cells: int = 1 << 15
) -> int:
    """Empirical count of distinct permutohedral cells one level touches over
    the local domain [-domain, domain]^3 (numpy, init-time only).

    Used to size per-level hash tables: coarse levels touch few cells, so
    their tables can be DENSE (collision-free) and much smaller than the
    hashed fine levels — shorter gather sweeps in the Pallas kernels and
    fewer collisions. Probe resolution adapts to the cell size; levels too
    fine to probe cheaply return ``max_cells`` (treat as hashed).
    """
    d = 3
    n = int(2 * domain / max(scale * 0.45, 1e-9)) + 8
    if n > 112:  # cells outnumber any practical dense table: hashed level
        return max_cells
    g = np.linspace(-domain, domain, n, dtype=np.float64)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    pts = np.stack([X, Y, Z], -1).reshape(-1, 3)
    cfs = (pts / scale + np.asarray(shifts_row)[None, :]) * np.asarray(elev_scale)[None, :]
    suffix = np.zeros((len(pts), d + 1))
    for i in range(d - 1, -1, -1):
        suffix[:, i] = suffix[:, i + 1] + cfs[:, i]
    elevated = np.concatenate(
        [suffix[:, :1], suffix[:, 1:] - np.arange(1, d + 1)[None] * cfs], axis=1
    )
    down = 1.0 / (d + 1)
    rem0 = np.round(elevated * down) * (d + 1)
    diff = elevated - rem0
    rank = np.zeros_like(rem0, dtype=np.int64)
    for i in range(d + 1):
        for j in range(i + 1, d + 1):
            smaller = diff[:, i] < diff[:, j]
            rank[:, i] += smaller
            rank[:, j] += ~smaller
    s = np.round(rem0.sum(-1) * down).astype(np.int64)
    r = rank + s[:, None]
    rem0 = rem0 + np.where(r < 0, d + 1, 0) - np.where(r > d, d + 1, 0)
    rank = r + np.where(r < 0, d + 1, 0) - np.where(r > d, d + 1, 0)
    keys = set()
    for k in range(d + 1):
        offset = np.where(rank[:, :d] < (d + 1 - k), k, k - (d + 1))
        key = rem0[:, :d].astype(np.int64) + offset
        keys.update(map(tuple, key))
        if len(keys) >= max_cells:
            return max_cells
    return len(keys)


def lattice_keys_and_weights(
    points: jnp.ndarray,  # (P, d)
    scales: jnp.ndarray,  # (L,)
    shifts: jnp.ndarray,  # (L, d)
    elev_scale: jnp.ndarray,  # (d,)
    capacity,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Channels-last wrapper over :func:`lattice_keys_and_weights_soa`."""
    d = points.shape[-1]
    coords = tuple(points[..., i] for i in range(d))
    return lattice_keys_and_weights_soa(coords, scales, shifts, elev_scale, capacity)


def lattice_keys_and_weights_soa(
    coords,  # tuple of d arrays, each (P,)
    scales: jnp.ndarray,  # (L,)
    shifts: jnp.ndarray,  # (L, d)
    elev_scale: jnp.ndarray,  # (d,)
    capacity,  # int (uniform) or per-level tuple
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Simplex corner hash indices and barycentric weights, points-minor.

    Takes structure-of-arrays coordinates so the hot path never touches a
    (P, 3)-shaped tensor (minor-dim-3 slices/transposes are pathologically
    slow on TPU).

    Returns:
        idx: (L, d+1, P) int32 hash-table indices per level and corner.
        w: (L, d+1, P) barycentric weights (sum to 1 over corners).
    """
    d = len(coords)

    cfs = [
        (coords[i][None, :] / scales[:, None] + shifts[:, i, None]) * elev_scale[i]
        for i in range(d)
    ]  # each (L, P)

    # Elevate onto the sum-zero hyperplane H_d:
    # elevated[0] = sum_i cf[i]; elevated[i] = sum_{j>=i} cf[j] - i*cf[i-1].
    suffix = [None] * (d + 1)
    suffix[d] = jnp.zeros_like(cfs[0])
    for i in range(d - 1, -1, -1):
        suffix[i] = suffix[i + 1] + cfs[i]
    elevated = [suffix[0]] + [suffix[i] - i * cfs[i - 1] for i in range(1, d + 1)]

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
    s = jnp.round(sum(rem0) * down).astype(jnp.int32)
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
    caps = normalize_capacities(capacity, rank[0].shape[0])
    cap_mask = jnp.asarray([c - 1 for c in caps], dtype=jnp.uint32)[:, None]  # (L, 1)
    idx_corners = []
    for k in range(d + 1):
        h = jnp.zeros_like(rank[0], dtype=jnp.uint32)
        for i in range(d):
            offset = jnp.where(rank[i] < (d + 1 - k), k, k - (d + 1))
            key_i = rem0[i].astype(jnp.int32) + offset
            h = h ^ (key_i.astype(jnp.uint32) * jnp.uint32(HASH_PRIMES[i]))
        idx_corners.append((h & cap_mask).astype(jnp.int32))
    idx = jnp.stack(idx_corners, axis=1)  # (L, d+1, P)
    return idx, w


# ---------------------------------------------------------------------------
# Gather + blend with scatter-free custom VJP.
# Tables are feature-major: (F, L, T) (feature axis MAJOR so the
# default layout tiles the (L, T) minor matrix T(8,128); see encodings.init).
# ---------------------------------------------------------------------------


def _use_pallas() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _gathered_feats(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table (F, L, T), idx (L, K, P) -> feats (L, F, K, P).

    On TPU uses the Pallas one-hot-matmul lookup kernel — XLA's native gather
    for 2-float rows measures ~295 ms at the training shape vs ~1-2 ms for
    the kernel (see ops/permuto_pallas.py). The swap to the kernel's
    per-(level) (2, T) contract is an edge transpose on this non-hot path
    (the production encode uses the fused kernels, not gather_blend).
    """
    l, k, p = idx.shape
    if _use_pallas():
        from neural_graph_mapping_tpu.ops import permuto_pallas

        feats = permuto_pallas.gather_pairs(
            jnp.swapaxes(table, 0, 1), idx.reshape(l, k * p)
        )
        return feats.reshape(l, 2, k, p)

    def per_level(tab_l, idx_l):  # (F, T), (K, P)
        return jnp.take(tab_l, idx_l, axis=1)  # (F, K, P)

    return jax.vmap(per_level, in_axes=(1, 0))(table, idx)


def _blend(table: jnp.ndarray, idx: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    feats = _gathered_feats(table, idx)  # (L, F, K, P)
    out = jnp.einsum("lfkp,lkp->lfp", feats, w)  # (L, F, P)
    l, f, p = out.shape
    return out.reshape(l * f, p)  # feature-major: no transpose anywhere


@jax.custom_vjp
def gather_blend(table: jnp.ndarray, idx: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """out[l*F + f, p] = sum_k table[f, l, idx[l, k, p]] * w[l, k, p].

    Args:
        table: (F, L, T) feature-MAJOR hash tables (see encodings init).
        idx: (L, K, P) int32 corner indices.
        w: (L, K, P) barycentric blend weights.

    Returns:
        (L*F, P) blended features, feature-MAJOR (points stay in the minor
        dimension through the whole field MLP — see ops/permuto.py docstring).
    """
    return _blend(table, idx, w)


def _gather_blend_fwd(table, idx, w):
    return _blend(table, idx, w), (table, idx, w)


def _table_grad_fallback(idx, gv, table_size):
    """Scatter-add table gradient for CPU / non-TPU backends.

    idx (L, K, P), gv (L, F, K*P) -> (L, F, T).
    """
    l, f, m = gv.shape

    def per_level(idx_l, gv_l):  # (K*P,), (F, M)
        z = jnp.zeros((f, table_size), gv.dtype)
        return z.at[:, idx_l].add(gv_l)

    return jax.vmap(per_level)(idx.reshape(l, m), gv)


def _gather_blend_bwd(res, g):
    table, idx, w = res
    F, L, T = table.shape
    _, K, P = idx.shape

    # cotangent g arrives feature-major (L*F, P): reshape only, no transpose
    g_r = g.reshape(L, F, P)

    # grad wrt w (exact): dw[l,k,p] = sum_f table[l, f, idx[l,k,p]] * g[l,f,p]
    feats = _gathered_feats(table, idx)  # (L, F, K, P), recomputed (cheap)
    grad_w = jnp.einsum("lfkp,lfp->lkp", feats, g_r)

    # grad wrt table: histogram of gv = w * g over the hash indices.
    # gv laid out (L, F, K, P) -> (L, F, K*P): reshape only, no transpose.
    gv = jnp.einsum("lkp,lfp->lfkp", w, g_r).reshape(L, F, K * P)
    if _use_pallas():
        from neural_graph_mapping_tpu.ops import permuto_pallas

        grad_table = permuto_pallas.table_grad(idx.reshape(L, K * P), gv, T)
    else:
        grad_table = _table_grad_fallback(idx, gv, T)
    # kernel emits per-level (L, F, T); param layout is feature-major (F, L, T)
    return jnp.swapaxes(grad_table, 0, 1), None, grad_w


gather_blend.defvjp(_gather_blend_fwd, _gather_blend_bwd)


# ---------------------------------------------------------------------------
# Fully-fused encode (TPU): lattice + lookup + blend in one Pallas kernel,
# with a fused backward that recomputes the lattice and histograms w * g
# straight into table gradients. idx/w never materialize in HBM.
#
# NOTE: this path returns ZERO cotangent for the coordinates (the training
# hot path never differentiates w.r.t. query points — sample positions and
# field poses are not trained). Paths that need point gradients (eikonal)
# must use the jnp lattice + gather_blend route (encodings.apply).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def encode_fused(table, coords, scales, shifts, elev, t_size):
    """table (..., 2, L, T) feature-major, coords (..., 3, P) -> (..., 2L, P)."""
    from neural_graph_mapping_tpu.ops import permuto_pallas

    return permuto_pallas.encode_fwd(table, coords, scales, shifts, elev, t_size)


def _encode_fused_fwd(table, coords, scales, shifts, elev, t_size):
    from neural_graph_mapping_tpu.ops import permuto_pallas

    out = permuto_pallas.encode_fwd(table, coords, scales, shifts, elev, t_size)
    return out, coords


def _encode_fused_bwd(scales, shifts, elev, t_size, coords, g):
    from neural_graph_mapping_tpu.ops import permuto_pallas

    grad_table = permuto_pallas.encode_bwd_table(
        coords, g, scales, shifts, elev, t_size
    )
    return grad_table, jnp.zeros_like(coords)


encode_fused.defvjp(_encode_fused_fwd, _encode_fused_bwd)


# ---------------------------------------------------------------------------
# Fully-fused encode + MLP (TPU training hot path): forward features feed the
# field MLP inside the kernel (written to HBM once, as the residual); the
# backward fuses MLP-backward with the table-gradient histogram so
# dL/dfeatures never materializes in HBM. Same zero-coordinate-cotangent
# caveat as encode_fused.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def encode_mlp_fused(table, w0, b0, w1, b1, coords, scales, shifts, elev, t_size):
    """table (..., 2, L, T), w0 (..., 2L, H), b0 (..., H), w1 (..., H, O),
    b1 (..., O), coords (..., 3, P) -> (..., O, P)."""
    from neural_graph_mapping_tpu.ops import permuto_pallas

    out, _ = permuto_pallas.encode_mlp_fwd(
        table, w0, b0, w1, b1, coords, scales, shifts, elev, t_size
    )
    return out


def _encode_mlp_fused_fwd(table, w0, b0, w1, b1, coords, scales, shifts, elev, t_size):
    from neural_graph_mapping_tpu.ops import permuto_pallas

    out, feats = permuto_pallas.encode_mlp_fwd(
        table, w0, b0, w1, b1, coords, scales, shifts, elev, t_size
    )
    return out, (coords, feats, w0, b0, w1, b1)


def _encode_mlp_fused_bwd(scales, shifts, elev, t_size, res, g):
    from neural_graph_mapping_tpu.ops import permuto_pallas

    coords, feats, w0, b0, w1, b1 = res
    grad_table, dw0, db0, dw1, db1 = permuto_pallas.encode_mlp_bwd(
        coords, feats, g, w0, b0, w1, b1, scales, shifts, elev, t_size
    )
    return grad_table, dw0, db0, dw1, db1, jnp.zeros_like(coords)


encode_mlp_fused.defvjp(_encode_mlp_fused_fwd, _encode_mlp_fused_bwd)
