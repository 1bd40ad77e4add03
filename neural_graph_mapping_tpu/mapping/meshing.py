"""Colored triangle-mesh extraction from the field set.

Rebuild of the reference ``_extract_mesh`` (run_mapping.py:2186-2384):
the mapped volume (field AABB +- 2 * radius) is split into blocks, the field
set's geometry channel is evaluated on each block's voxel grid with the KNN
blend path (TPU), the isosurface is extracted host-side (native marching
tetrahedra instead of pytorch3d marching_cubes), and vertices are recolored by
re-evaluating the field set with an enlarged radius (avoids black seams at
field boundaries, run_mapping.py:2320-2332). Output: PLY + a ``*_fields.txt``
with field positions.
"""

from __future__ import annotations

import logging
import pathlib
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from neural_graph_mapping_tpu.ops import native
from neural_graph_mapping_tpu.utils import chunking, meshio, transforms

logger = logging.getLogger(__name__)


def geometry_to_volume(geometry_mode: str, volume: np.ndarray, geometry_factor: float):
    """Geometry-mode-specific isolevel handling (run_mapping.py:2274-2292).

    Returns (volume, isolevel) such that the surface is volume == isolevel
    with 'inside' being *below* the isolevel (our marching tetrahedra's
    convention: inside = value < iso).
    """
    if geometry_mode == "occupancy":
        vol = 1.0 / (1.0 + np.exp(-geometry_factor * volume))
        return -vol, -0.5  # high occupancy is inside
    if geometry_mode == "density":
        return -volume, -30.0  # isolevel 30, high density inside
    if geometry_mode in ("neus", "nrgbd"):
        return volume, 0.0  # signed-distance-like: negative inside
    raise ValueError(f"Unknown geometry_mode {geometry_mode!r}")


def extract_mesh(
    fset,
    params,
    field_positions: jnp.ndarray,
    field_orientations: jnp.ndarray,
    field_valid: jnp.ndarray,
    field_radius: float,
    geometry_mode: str,
    geometry_factor: float,
    color_factor: float = 1.0,
    resolution: float = 0.02,
    threshold: Optional[float] = None,
    transform: Optional[np.ndarray] = None,
    block_size: int = 128,
    eval_chunk: int = 262144,
    knn_capacity: int = 32768,
    mesh_file_path: Optional[pathlib.Path] = None,
) -> Optional[meshio.Mesh]:
    """Extract the colored isosurface mesh of the current map.

    Args:
        fset / params: the NeuralFieldSet and its stacked params.
        field_*: map registry arrays (+ validity over padded capacity).
        resolution: voxel size in meters (run_mapping.py:2226).
        transform: optional 4x4 applied to field poses first (gt_from_est).
        block_size: voxels per block edge (reference uses 200).
        mesh_file_path: if given, saves PLY + ``*_fields.txt``.

    Returns:
        The extracted mesh (None if no surface crossed).
    """
    positions = np.asarray(field_positions)
    orientations = np.asarray(field_orientations)
    valid = np.asarray(field_valid)
    if transform is not None:
        t = np.asarray(transform, np.float32)
        positions = positions @ t[:3, :3].T + t[:3, 3]
        orientations = np.asarray(
            transforms.transform_quaternions(
                jnp.asarray(orientations), jnp.asarray(t)
            )
        )
    active = positions[valid]
    if len(active) == 0:
        return None
    bb_min = active.min(axis=0) - 2 * field_radius
    bb_max = active.max(axis=0) + 2 * field_radius

    axes = [np.arange(bb_min[d], bb_max[d], resolution, dtype=np.float32) for d in range(3)]
    positions_j = jnp.asarray(positions)
    orientations_j = jnp.asarray(orientations)
    valid_j = jnp.asarray(valid)

    use_tiled = (
        getattr(fset, "supports_tiled_knn", lambda: False)()
        and jax.default_backend() == "tpu"
    )

    def eval_points(pts: np.ndarray, radius: float) -> np.ndarray:
        """Chunked KNN evaluation of (N, 3) world points -> (N, 4)."""

        drop_counts = []

        def model(chunk):
            if use_tiled:  # skew-proof dispatch, no capacity drops
                return fset.apply_knn_tiled(
                    params, chunk, positions_j, orientations_j, valid_j,
                    field_radius=radius,
                )
            out, dropped = fset.apply_knn(
                params, chunk, positions_j, orientations_j, valid_j,
                capacity=knn_capacity, field_radius=radius, with_stats=True,
            )
            drop_counts.append(dropped)
            return out

        result = np.asarray(
            chunking.batched_evaluation(model, jnp.asarray(pts), eval_chunk)
        )
        chunking.warn_dropped_pairs(drop_counts, logger, "meshing", knn_capacity)
        return result

    all_verts, all_faces, all_colors = [], [], []
    vert_offset = 0

    for xs0 in range(0, max(len(axes[0]) - 1, 1), block_size):
        for ys0 in range(0, max(len(axes[1]) - 1, 1), block_size):
            for zs0 in range(0, max(len(axes[2]) - 1, 1), block_size):
                bx = axes[0][xs0 : xs0 + block_size + 1]
                by = axes[1][ys0 : ys0 + block_size + 1]
                bz = axes[2][zs0 : zs0 + block_size + 1]
                if len(bx) < 2 or len(by) < 2 or len(bz) < 2:
                    continue
                gx, gy, gz = np.meshgrid(bx, by, bz, indexing="ij")
                pts = np.stack([gx, gy, gz], -1).reshape(-1, 3).astype(np.float32)

                # quick reject: does any field sphere touch this block?
                blk_min = np.array([bx[0], by[0], bz[0]]) - field_radius
                blk_max = np.array([bx[-1], by[-1], bz[-1]]) + field_radius
                touching = (
                    (active >= blk_min[None]) & (active <= blk_max[None])
                ).all(-1)
                if not touching.any():
                    continue

                geo = eval_points(pts, field_radius)[:, 3].reshape(
                    len(bx), len(by), len(bz)
                )
                if not np.isfinite(geo).all():
                    logger.warning("non-finite volume in mesh block; clamping")
                    geo = np.nan_to_num(geo, nan=1.0, posinf=1.0, neginf=-1.0)
                vol, iso = geometry_to_volume(geometry_mode, geo, geometry_factor)
                if threshold is not None:
                    iso = threshold
                verts, tris = native.marching_tetrahedra(vol, iso)
                if len(verts) == 0:
                    continue
                # grid-index -> world coordinates
                verts_w = np.stack(
                    [
                        bx[0] + verts[:, 0] * resolution,
                        by[0] + verts[:, 1] * resolution,
                        bz[0] + verts[:, 2] * resolution,
                    ],
                    axis=-1,
                ).astype(np.float32)
                colors = eval_points(verts_w, field_radius + 0.1)[:, :3]
                colors = np.clip(color_factor * colors, 0.0, 1.0)

                all_verts.append(verts_w)
                all_faces.append(tris + vert_offset)
                all_colors.append(colors)
                vert_offset += len(verts_w)

    if not all_verts:
        logger.warning("could not extract mesh: not crossing isosurface")
        return None

    mesh = meshio.Mesh(
        np.concatenate(all_verts),
        np.concatenate(all_faces),
        np.concatenate(all_colors),
    )
    if mesh_file_path is not None:
        mesh_file_path = pathlib.Path(mesh_file_path)
        meshio.save_ply(mesh_file_path, mesh)
        np.savetxt(
            mesh_file_path.with_name(mesh_file_path.stem + "_fields.txt"), active
        )
    return mesh
