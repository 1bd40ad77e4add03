"""Field/map registry: SoA arrays, grid-based allocation, pose re-anchoring.

TPU-native rebuild of the reference's ``_global_map_dict`` machinery
(run_mapping.py:231-345) and the loop-closure map deformation
(run_mapping.py:844-952). Design per SURVEY.md section 7:

- The map is a struct-of-arrays pytree with *fixed capacity*; growth doubles
  the capacity outside jit (rare recompiles), and every jitted consumer works
  on the full padded arrays with ``num``/validity masks.
- Field allocation (which new grid cells need a field to cover the current
  depth image, run_mapping.py:267-345) runs as one jitted program with a
  static ``max_new`` output: uncovered depth points are quantized to a
  randomly-shifted grid, deduplicated by sorting cell codes, filtered against
  cells already owning a field, and emitted as padded cell centers + count.
- Loop-closure deformation (run_mapping.py:937-952) is a per-field rigid
  update ``T = new_kf2w @ inv(prev_kf2w)`` gathered from per-keyframe-slot
  pose arrays — a tiny batched matmul, never a recompile.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from neural_graph_mapping_tpu.utils import transforms


class MapArrays(NamedTuple):
    """Device-side SoA map registry (reference run_mapping.py:231-246).

    All arrays are padded to ``capacity``; entries >= num are invalid.
    ``kf_slots`` additionally stores each field's anchor keyframe *cache slot*
    so pose re-anchoring can gather keyframe poses without a frame-id lookup.
    """

    positions: jnp.ndarray  # (cap, 3) world positions
    orientations: jnp.ndarray  # (cap, 4) world orientations, wxyz
    kf_ids: jnp.ndarray  # (cap,) anchor keyframe frame-id
    kf_slots: jnp.ndarray  # (cap,) anchor keyframe cache slot
    training_iterations: jnp.ndarray  # (cap,)


def init_map_arrays(capacity: int = 32) -> MapArrays:
    return MapArrays(
        positions=jnp.zeros((capacity, 3)),
        orientations=jnp.zeros((capacity, 4)).at[:, 0].set(1.0),
        kf_ids=jnp.zeros((capacity,), jnp.int32),
        kf_slots=jnp.zeros((capacity,), jnp.int32),
        training_iterations=jnp.zeros((capacity,), jnp.int32),
    )


def capacity(arrays: MapArrays) -> int:
    return arrays.positions.shape[0]


def grow_capacity(arrays: MapArrays, required: int) -> MapArrays:
    """Double (repeatedly) the padded capacity — host-side, outside jit
    (replaces run_mapping.py:252-263)."""
    cap = capacity(arrays)
    new_cap = cap
    while new_cap < required:
        new_cap *= 2
    if new_cap == cap:
        return arrays
    pad = new_cap - cap

    def pad_leaf(leaf):
        pad_shape = (pad,) + leaf.shape[1:]
        return jnp.concatenate([leaf, jnp.zeros(pad_shape, leaf.dtype)], axis=0)

    grown = MapArrays(*(pad_leaf(leaf) for leaf in arrays))
    return grown._replace(orientations=grown.orientations.at[cap:, 0].set(1.0))


def field_cell_size(field_radius: float) -> float:
    """Grid cell size such that a field at the cell center covers the cell
    (cell diagonal = 2r; run_mapping.py:299)."""
    return 2.0 * field_radius / math.sqrt(3.0)


_CELL_OFFSET = 500
_CELL_BASE = 1001  # 1001**3 < 2**31: codes fit int32 (jax default int width)
_INVALID_CODE = jnp.iinfo(jnp.int32).max


def _cell_code(ijk: jnp.ndarray) -> jnp.ndarray:
    """Pack integer grid coords (..., 3) into one sortable int32 code.

    Cells within +-500 cells of the origin (> 500 m at 1 m field radius) are
    uniquely encoded; beyond that coords clamp, which only risks skipping an
    allocation (it will be retried next keyframe).
    """
    c = jnp.clip(ijk + _CELL_OFFSET, 0, _CELL_BASE - 1).astype(jnp.int32)
    return (c[..., 0] * _CELL_BASE + c[..., 1]) * _CELL_BASE + c[..., 2]


def _code_to_cell(code: jnp.ndarray) -> jnp.ndarray:
    z = code % _CELL_BASE
    y = (code // _CELL_BASE) % _CELL_BASE
    x = code // (_CELL_BASE * _CELL_BASE)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32) - _CELL_OFFSET


def uncovered_cells(
    key: jax.Array,
    points_world: jnp.ndarray,
    points_valid: jnp.ndarray,
    field_positions: jnp.ndarray,
    field_valid: jnp.ndarray,
    field_radius: float,
    max_new: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """New-field cell centers covering currently-uncovered depth points.

    The jitted core of ``_extend_global_map_dict`` (run_mapping.py:267-345):

    1. coverage check: a point is covered if any valid field center lies
       within ``field_radius`` (brute-force min-distance; replaces CUDA
       ball_query). Chunked over fields to bound the intermediate.
    2. uncovered points -> randomly-shifted grid cells -> dedupe by sorting
       packed cell codes.
    3. drop cells that already contain a field center (set difference via
       searchsorted against the fields' own cell codes).

    Returns:
        centers: (max_new, 3) padded cell-center world positions.
        num_new: scalar int32 count of valid rows.
    """
    cell = field_cell_size(field_radius)
    shift = jax.random.uniform(key, (3,), minval=0.0, maxval=cell)

    # -- 1. coverage ---------------------------------------------------------
    n = field_positions.shape[0]
    chunk = min(1024, n)
    num_chunks = (n + chunk - 1) // chunk
    pad = num_chunks * chunk - n
    fpos = jnp.concatenate([field_positions, jnp.zeros((pad, 3))], axis=0)
    fval = jnp.concatenate([field_valid, jnp.zeros((pad,), bool)], axis=0)
    fpos = fpos.reshape(num_chunks, chunk, 3)
    fval = fval.reshape(num_chunks, chunk)

    p_sq = jnp.sum(points_world**2, axis=-1)

    def body(i, min_d_sq):
        c_pos = fpos[i]
        c_val = fval[i]
        c_sq = jnp.sum(c_pos**2, axis=-1)
        d_sq = p_sq[:, None] + c_sq[None, :] - 2.0 * points_world @ c_pos.T
        d_sq = jnp.where(c_val[None, :], d_sq, jnp.inf)
        return jnp.minimum(min_d_sq, jnp.min(d_sq, axis=-1))

    min_d_sq = jax.lax.fori_loop(
        0, num_chunks, body, jnp.full((points_world.shape[0],), jnp.inf)
    )
    uncovered = points_valid & (min_d_sq > field_radius**2)

    # -- 2. quantize + dedupe --------------------------------------------------
    ijk = jnp.floor((points_world + shift) / cell).astype(jnp.int32)
    codes = _cell_code(ijk)
    codes = jnp.where(uncovered, codes, _INVALID_CODE)
    codes = jnp.sort(codes)
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), codes[1:] != codes[:-1]]
    ) & (codes < _INVALID_CODE)

    # -- 3. exclude cells already holding a field ------------------------------
    f_ijk = jnp.floor((field_positions + shift) / cell).astype(jnp.int32)
    f_codes = jnp.where(field_valid, _cell_code(f_ijk), _INVALID_CODE)
    f_codes = jnp.sort(f_codes)
    pos = jnp.searchsorted(f_codes, codes)
    already = jnp.take(f_codes, jnp.clip(pos, 0, f_codes.shape[0] - 1)) == codes
    fresh = is_first & ~already

    # compact the first max_new fresh codes into the output
    order = jnp.cumsum(fresh) - 1  # destination index per fresh code
    dest = jnp.where(fresh & (order < max_new), order, max_new)
    out_codes = jnp.full((max_new + 1,), _INVALID_CODE).at[dest].set(codes, mode="drop")
    out_codes = out_codes[:max_new]
    num_new = jnp.minimum(jnp.sum(fresh), max_new).astype(jnp.int32)

    cells = _code_to_cell(out_codes)
    centers = (cells.astype(jnp.float32) + 0.5) * cell - shift
    valid_rows = jnp.arange(max_new) < num_new
    centers = jnp.where(valid_rows[:, None], centers, 0.0)
    return centers, num_new


def reanchor_field_poses(
    arrays: MapArrays,
    prev_kf2w_slots: jnp.ndarray,
    new_kf2w_slots: jnp.ndarray,
) -> MapArrays:
    """Loop-closure map deformation (run_mapping.py:937-952).

    Equivalent to the reference's absolute -> keyframe-relative (with previous
    keyframe poses) -> absolute (with new keyframe poses) round trip
    (run_mapping.py:844-885), collapsed into one per-field rigid transform
    ``T_f = new_kf2w[slot_f] @ inv(prev_kf2w[slot_f])``.

    Args:
        arrays: map registry (kf_slots selects each field's anchor pose).
        prev_kf2w_slots: (num_slots, 4, 4) keyframe poses before the update.
        new_kf2w_slots: (num_slots, 4, 4) keyframe poses after the update.
    """
    prev = prev_kf2w_slots[arrays.kf_slots]  # (cap, 4, 4)
    new = new_kf2w_slots[arrays.kf_slots]
    delta = new @ transforms.invert_rigid(prev)
    # guard: keyframes with NaN poses (tracking lost) leave fields untouched
    ok = jnp.isfinite(delta.reshape(delta.shape[0], -1)).all(axis=-1)
    new_pos = transforms.transform_points(arrays.positions, delta)
    new_quat = transforms.transform_quaternions(arrays.orientations, delta)
    return arrays._replace(
        positions=jnp.where(ok[:, None], new_pos, arrays.positions),
        orientations=jnp.where(ok[:, None], new_quat, arrays.orientations),
    )


@jax.jit
def append_fields(
    arrays: MapArrays,
    num_existing: int,
    centers: jnp.ndarray,
    num_new: int,
    frame_id: int,
    kf_slot: int,
) -> MapArrays:
    """Write freshly-allocated fields into the padded registry (host-driven;
    run_mapping.py:325-345). ``num_new`` rows of ``centers`` are valid.

    Jitted as ONE program: un-jitted, the five scatter updates each paid this
    TPU's per-dispatch relay overhead (~40 ms) — measured r5 as the bulk of
    a 0.47 s/keyframe allocation phase (90 s of a 960-frame mapping run)."""
    idx = num_existing + jnp.arange(centers.shape[0])
    write = jnp.arange(centers.shape[0]) < num_new
    safe_idx = jnp.where(write, idx, capacity(arrays))  # drop out-of-range
    ident = jnp.zeros((centers.shape[0], 4)).at[:, 0].set(1.0)
    return arrays._replace(
        positions=arrays.positions.at[safe_idx].set(centers, mode="drop"),
        orientations=arrays.orientations.at[safe_idx].set(ident, mode="drop"),
        kf_ids=arrays.kf_ids.at[safe_idx].set(frame_id, mode="drop"),
        kf_slots=arrays.kf_slots.at[safe_idx].set(kf_slot, mode="drop"),
        training_iterations=arrays.training_iterations.at[safe_idx].set(0, mode="drop"),
    )
