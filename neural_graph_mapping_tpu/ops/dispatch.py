"""Mixture-of-experts-style point->field dispatch for inference paths.

The reference's non-vmap (render / meshing) path loops over unique fields in
Python and evaluates each field on a boolean-masked subset
(models.py:347-405) — its stated inference bottleneck. The TPU-native
formulation treats fields as *experts* and query points as *tokens*: route
each (point, k-th neighbor) pair to its field, sort pairs by field id, pack
them into a static (num_fields, capacity) buffer, evaluate all fields with one
``jax.vmap`` over the stacked parameter pytree (dense batched matmuls on the
MXU), and un-permute. One XLA program, no host loop, no dynamic shapes.

Capacity overflow (more pairs routed to a field than ``capacity``) drops the
excess pairs; callers renormalize blend weights over surviving pairs. Render
drivers size the capacity generously (and can re-bucket between chunks, which
only recompiles when the padded capacity changes).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def topk_fields(
    points: jnp.ndarray,
    centers: jnp.ndarray,
    valid: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """K-nearest valid field centers per query point.

    Brute force over all centers — fields number in the low thousands, so the
    (P, N) distance matrix is small and MXU-friendly (replaces
    ``pytorch3d.ops.knn_points``, models.py:361-366).

    Args:
        points: (P, 3) query points.
        centers: (N, 3) field centers (padded slots allowed).
        valid: (N,) False for padded slots.
        k: number of neighbors.

    Returns:
        dists: (P, k) euclidean distances (inf for invalid).
        idx: (P, k) field indices.
    """
    # squared distances via the expanded form so the cross term is one matmul
    p_sq = jnp.sum(points**2, axis=-1, keepdims=True)  # (P, 1)
    c_sq = jnp.sum(centers**2, axis=-1)  # (N,)
    d_sq = p_sq + c_sq[None, :] - 2.0 * points @ centers.T
    d_sq = jnp.where(valid[None, :], d_sq, jnp.inf)
    # fewer fields than neighbors requested: pad with inf/last (the reference
    # instead shrinks K, models.py:355-358; masked pairs are dropped upstream)
    if k > d_sq.shape[-1]:
        pad = k - d_sq.shape[-1]
        d_sq = jnp.concatenate(
            [d_sq, jnp.full(d_sq.shape[:-1] + (pad,), jnp.inf)], axis=-1
        )
    if k <= 4:
        # iterated argmin + mask: XLA's top_k lowers to a per-row sort on TPU
        # and dominated full-image rendering (~700 ms per 8192x512-sample
        # block, ~half the render time — traced); k passes of a lane-wise min
        # reduction are ~10x cheaper for the small k this pipeline uses.
        lanes = jax.lax.broadcasted_iota(jnp.int32, d_sq.shape, len(d_sq.shape) - 1)
        vals, idxs = [], []
        run = d_sq
        for _ in range(k):
            v = jnp.min(run, axis=-1)
            i = jnp.argmin(run, axis=-1)
            vals.append(v)
            idxs.append(i)
            run = jnp.where(lanes == i[..., None], jnp.inf, run)
        neg_d = -jnp.stack(vals, axis=-1)
        idx = jnp.stack(idxs, axis=-1).astype(jnp.int32)
    else:
        neg_d, idx = jax.lax.top_k(-d_sq, k)
    idx = jnp.minimum(idx, centers.shape[0] - 1)
    return jnp.sqrt(jnp.maximum(-neg_d, 0.0)), idx


def dispatch_indices(
    expert_ids: jnp.ndarray,
    pair_valid: jnp.ndarray,
    num_experts: int,
    capacity: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Compute buffer slots for a sorted capacity-based dispatch.

    Args:
        expert_ids: (M,) int32 expert per pair.
        pair_valid: (M,) bool; invalid pairs are never dispatched.
        num_experts: static expert count N.
        capacity: static per-expert capacity C.

    Returns:
        slot: (M,) int32 flat index into an (N*C,) buffer for each pair, or
            N*C (out-of-range, to be dropped) for invalid/overflow pairs.
        kept: (M,) bool — True where the pair made it into the buffer.
        counts: (N,) int32 number of pairs routed to each expert (pre-capacity).
    """
    ids = jnp.where(pair_valid, expert_ids, num_experts).astype(jnp.int32)
    order = jnp.argsort(ids, stable=True)
    sorted_ids = ids[order]
    # rank of each sorted pair within its expert segment
    seg_start = jnp.searchsorted(sorted_ids, jnp.arange(num_experts + 1, dtype=sorted_ids.dtype))
    rank_sorted = jnp.arange(ids.shape[0], dtype=jnp.int32) - seg_start[
        jnp.clip(sorted_ids, 0, num_experts)
    ].astype(jnp.int32)
    kept_sorted = (rank_sorted < capacity) & (sorted_ids < num_experts)
    slot_sorted = jnp.where(
        kept_sorted, sorted_ids * capacity + rank_sorted, num_experts * capacity
    )
    # scatter back to original pair order
    inv = jnp.argsort(order)
    slot = slot_sorted[inv]
    kept = kept_sorted[inv]
    counts = seg_start[1 : num_experts + 1] - seg_start[:num_experts]
    return slot, kept, counts.astype(jnp.int32)


def tiled_dispatch_indices(
    expert_ids: jnp.ndarray,
    pair_valid: jnp.ndarray,
    num_experts: int,
    tile: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sorted dispatch with per-expert segments padded to tile boundaries.

    Unlike :func:`dispatch_indices` (fixed per-expert capacity, silently drops
    overflow), this packs ALL valid pairs into a flat buffer where every
    ``tile``-sized chunk is owned by exactly one expert — the layout consumed
    by the scalar-prefetch Pallas MoE encode kernel
    (ops/permuto_pallas.encode_fwd_moe). Buffer size is
    ``total + num_experts * tile`` in the worst case (each expert wastes at
    most one partial tile), independent of per-expert demand skew — the
    previous max-demand x num_experts sizing exploded 100x under dominant
    fields (see VERDICT round 1).

    Args:
        expert_ids: (M,) int32 expert per pair.
        pair_valid: (M,) bool; invalid pairs get an out-of-range slot.
        num_experts: static expert count N.
        tile: static tile size (the Pallas kernel's point-tile).

    Returns:
        slot: (M,) int32 position in the flat (num_tiles * tile,) buffer, or
            num_tiles * tile for invalid pairs (out of range — use mode="drop").
        tile_expert: (num_tiles,) int32 owning expert per tile. Unused
            trailing tiles map to expert ``num_experts - 1`` (the searchsorted
            result is clipped); their buffer slots are never read back, but
            the static-grid Pallas kernel does DMA+evaluate them against the
            last expert's table — dead work, consider ``pl.when`` masking if
            it shows in profiles.
        num_used_tiles: () int32 tiles actually occupied.
    """
    m = expert_ids.shape[0]
    num_tiles = m // tile + num_experts  # static: sum ceil(c_f/tile)*tile bound
    ids = jnp.where(pair_valid, expert_ids, num_experts).astype(jnp.int32)
    order = jnp.argsort(ids, stable=True)
    sorted_ids = ids[order]
    seg_start = jnp.searchsorted(
        sorted_ids, jnp.arange(num_experts + 1, dtype=sorted_ids.dtype)
    ).astype(jnp.int32)
    counts = seg_start[1:] - seg_start[:-1]  # (N,)
    padded = ((counts + tile - 1) // tile) * tile
    pad_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded, dtype=jnp.int32)]
    )  # (N+1,)
    rank = jnp.arange(m, dtype=jnp.int32) - seg_start[
        jnp.clip(sorted_ids, 0, num_experts)
    ]
    in_range = sorted_ids < num_experts
    slot_sorted = jnp.where(
        in_range,
        pad_start[jnp.minimum(sorted_ids, num_experts - 1)] + rank,
        num_tiles * tile,
    )
    slot = jnp.zeros((m,), jnp.int32).at[order].set(slot_sorted)
    tile_expert = jnp.clip(
        jnp.searchsorted(
            pad_start, jnp.arange(num_tiles, dtype=jnp.int32) * tile, side="right"
        )
        - 1,
        0,
        num_experts - 1,
    ).astype(jnp.int32)
    num_used_tiles = pad_start[num_experts] // tile
    return slot, tile_expert, num_used_tiles


def tiled_dispatch_sorted(
    expert_ids: jnp.ndarray,  # (M,) int32
    pair_valid: jnp.ndarray,  # (M,) bool
    payloads,  # tuple of (M,) f32 arrays co-sorted with the ids
    num_experts: int,
    tile: int,
):
    """Sort-based tile dispatch with NO per-pair random access.

    ONE variadic sort carries the pair payloads (coordinates) into
    expert-sorted order. Because each expert's padded tile region is
    contiguous in both the sorted array and the tile buffer, filling the
    buffer is a per-tile CONTIGUOUS slice ``sorted[tile_src[t] :
    tile_src[t] + tile]`` — a vmapped ``lax.dynamic_slice``, not a scatter —
    and returning outputs to pair order is one key sort on the carried
    original indices (see ``apply_knn_tiled``).

    Replaces the per-pair path of :func:`tiled_dispatch_indices` whose
    random-access ops dominated full-image rendering on TPU (measured r3,
    per 8.4M-pair block: argsort + sorted_ids gather 60 ms, two
    129-entry-table per-pair gathers 151 ms, original-order coord scatters
    164 ms, output pair-gather 170 ms — XLA serializes TPU scalar
    gather/scatter at ~12 ns/element).

    Invalid pairs sort into a trailing group (key ``num_experts``) whose
    tiles map to expert ``num_experts - 1``; their outputs are garbage but
    their original indices still ride in the key channel so the sort-back
    is position-exact, and callers mask them with ``pair_valid``.
    ``num_live_tiles`` bounds the tiles holding VALID pairs for kernels
    that want to skip the dead work.

    Returns:
        sorted_payloads: tuple of (M,) arrays, expert-sorted.
        orig_idx: (M,) int32 original pair index per sorted position.
        tile_src: (num_tiles,) int32 start into the sorted arrays per tile
            (clipped to [0, M]; callers pad sorted arrays by one tile so the
            slice never clamps-and-shifts real lanes).
        tile_expert: (num_tiles,) int32 owning expert per tile (invalid and
            dead tiles clipped to num_experts - 1).
        tile_count: (num_tiles,) int32 REAL lanes per tile (< tile for the
            last tile of each expert's segment; 0 for dead tiles).
        num_live_tiles: () int32 tiles holding VALID pairs.
        num_tiles: static int total tiles (= buffer size / tile).
    """
    m = expert_ids.shape[0]
    # +1 group for the invalid pairs; ceil(m/tile) + one partial tile per group
    num_tiles = -(-m // tile) + num_experts + 1
    ids = jnp.where(pair_valid, expert_ids, num_experts).astype(jnp.int32)
    iota = jnp.arange(m, dtype=jnp.int32)
    sorted_all = jax.lax.sort(
        (ids, iota) + tuple(payloads), num_keys=1, is_stable=True
    )
    sorted_ids, orig_idx = sorted_all[0], sorted_all[1]
    sorted_payloads = sorted_all[2:]

    # segment starts = #ids below each group id. Phrased as a compare+reduce
    # over the UNSORTED ids so XLA streams the 8.4M-lane array once with a
    # (N+2,)-lane accumulator — jnp.searchsorted on the sorted array lowered
    # to a binary-search while loop that cost 12 ms/block (traced r4).
    # Correct only while XLA fuses the broadcast+reduce (it does on TPU); if
    # a backend ever materializes the (M, N+2) compare matrix, switch to
    # jnp.bincount(ids, length=num_experts+1) + cumsum (O(M), fusion-free)
    bins = jnp.arange(num_experts + 2, dtype=jnp.int32)
    seg_start = jnp.sum(
        (ids[:, None] < bins[None, :]).astype(jnp.int32), axis=0
    )  # (N+2,)
    counts = seg_start[1:] - seg_start[:-1]  # (N+1,) incl. invalid group
    padded = ((counts + tile - 1) // tile) * tile
    pad_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded, dtype=jnp.int32)]
    )  # (N+2,)

    t_start = jnp.arange(num_tiles, dtype=jnp.int32) * tile
    group = jnp.clip(
        jnp.searchsorted(pad_start, t_start, side="right") - 1, 0, num_experts
    )  # (num_tiles,) in [0, N]; all small-table lookups below are O(num_tiles)
    raw_src = t_start - (pad_start[group] - seg_start[group])
    tile_count = jnp.clip(seg_start[group + 1] - raw_src, 0, tile)
    tile_src = jnp.clip(raw_src, 0, m)
    tile_expert = jnp.minimum(group, num_experts - 1).astype(jnp.int32)
    num_live_tiles = pad_start[num_experts] // tile
    return (
        sorted_payloads, orig_idx, tile_src, tile_expert, tile_count,
        num_live_tiles, num_tiles,
    )


def expert_eval(
    apply_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    stacked_params,
    points: jnp.ndarray,
    expert_ids: jnp.ndarray,
    pair_valid: jnp.ndarray,
    num_experts: int,
    capacity: int,
    out_dim: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate per-pair expert outputs with a static dispatch buffer.

    Args:
        apply_fn: ``(field_params, points (C, 3)) -> (C, out_dim)``; vmapped
            over the leading expert axis of ``stacked_params``.
        stacked_params: pytree with leading axis num_experts.
        points: (M, 3) query points (already in the frame expected by
            apply_fn's caller — typically world; apply_fn handles local).
        expert_ids: (M,) routing.
        pair_valid: (M,).
        num_experts / capacity: static dispatch geometry.
        out_dim: static output feature dim.

    Returns:
        outs: (M, out_dim), zeros for dropped pairs.
        kept: (M,) bool.
    """
    m, dim = points.shape
    slot, kept, _ = dispatch_indices(expert_ids, pair_valid, num_experts, capacity)

    buf_pts = jnp.zeros((num_experts * capacity, dim), points.dtype)
    buf_pts = buf_pts.at[slot].set(points, mode="drop")
    buf_pts = buf_pts.reshape(num_experts, capacity, dim)

    buf_out = jax.vmap(apply_fn)(stacked_params, buf_pts)  # (N, C, out_dim)
    buf_out = buf_out.reshape(num_experts * capacity, out_dim)

    # gather back; dropped pairs read slot N*C -> use a padded row of zeros
    padded = jnp.concatenate([buf_out, jnp.zeros((1, out_dim), buf_out.dtype)], axis=0)
    outs = padded[jnp.minimum(slot, num_experts * capacity)]
    outs = jnp.where(kept[:, None], outs, 0.0)
    return outs.reshape(m, out_dim), kept
