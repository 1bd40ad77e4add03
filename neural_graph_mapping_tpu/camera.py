"""Pinhole camera model with pixel-center convention handling, in JAX.

TPU-native rebuild of the reference ``src/neural_graph_mapping/camera.py``.
The camera itself is a hashable frozen dataclass of Python scalars, so it can
be closed over (or passed as a static argument) by jitted functions; all array
math is jnp with static shapes.

Key deviation from the reference: ``depth_to_pointcloud`` (camera.py:342-395)
uses ``torch.nonzero`` and returns a dynamically-shaped cloud. Under XLA we
back-project *every* pixel and return a validity mask instead
(:meth:`Camera.depth_to_points_full`); callers sample with masked categorical
draws rather than boolean indexing.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Camera:
    """Pinhole camera intrinsics (reference camera.py:14-116).

    The principal point is stored internally with pixel_center == 0.5
    convention, exactly like the reference (camera.py:68-70).
    """

    width: int
    height: int
    fx: float
    fy: float
    cx: float  # stored at pixel_center 0.5 (set via `create`)
    cy: float
    s: float = 0.0

    @staticmethod
    def create(
        width: int,
        height: int,
        fx: float,
        fy: float,
        cx: float,
        cy: float,
        s: float = 0.0,
        pixel_center: float = 0.0,
    ) -> "Camera":
        """Build a camera from intrinsics given in any pixel-center convention."""
        if s != 0.0:
            raise NotImplementedError("Skew != 0 not supported.")
        return Camera(
            width=int(width),
            height=int(height),
            fx=float(fx),
            fy=float(fy),
            cx=float(cx) - pixel_center + 0.5,
            cy=float(cy) - pixel_center + 0.5,
            s=float(s),
        )

    # -- intrinsics ---------------------------------------------------------

    def get_pinhole_camera_parameters(self, pixel_center: float) -> Tuple:
        """Return (fx, fy, cx, cy, s) in the requested pixel-center convention."""
        return (
            self.fx,
            self.fy,
            self.cx - 0.5 + pixel_center,
            self.cy - 0.5 + pixel_center,
            self.s,
        )

    def get_projection_matrix(
        self, convention: str = "opencv", pixel_center: float = 0.5
    ) -> jnp.ndarray:
        """3x3 projection matrix (reference camera.py:156-184)."""
        fx, fy, cx, cy, _ = self.get_pinhole_camera_parameters(pixel_center)
        if convention == "opencv":
            return jnp.asarray([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]])
        elif convention == "opengl":
            return jnp.asarray([[fx, 0.0, -cx], [0.0, -fy, -cy], [0.0, 0.0, -1.0]])
        raise ValueError(f"Unsupported camera convention {convention}.")

    def scaled_camera(self, scale_factor: float) -> "Camera":
        """Camera with all intrinsics scaled (reference camera.py:205-213)."""
        return Camera(
            width=int(self.width * scale_factor),
            height=int(self.height * scale_factor),
            fx=self.fx * scale_factor,
            fy=self.fy * scale_factor,
            cx=self.cx * scale_factor,
            cy=self.cy * scale_factor,
        )

    # -- projection / rays --------------------------------------------------

    def project_points(
        self,
        points: jnp.ndarray,
        convention: str,
        pixel_center: float = 0.5,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Project 3D camera-frame points to continuous image coordinates.

        Returns (points2d (..., 2) [x, y], in_front_mask (...)). Matches the
        reference's ``project_points`` (camera.py:119-154) but always returns
        the in-front mask (cheap, and XLA prunes it when unused).
        """
        proj = self.get_projection_matrix(convention, pixel_center)
        homo = jnp.einsum("oi,...i->...o", proj, points)
        z = homo[..., 2]
        points2d = homo[..., :2] / z[..., None]
        return points2d, z > 0.0

    def ijs_to_directions(
        self, ijs: jnp.ndarray, convention: str = "opengl"
    ) -> jnp.ndarray:
        """Convert (row, column) indices to unit ray directions (camera.py:186-203)."""
        fx, fy, cx, cy, _ = self.get_pinhole_camera_parameters(0.0)
        d_x = (ijs[..., 1] - cx) / fx
        d_y = (ijs[..., 0] - cy) / fy
        if convention == "opengl":
            d_y = -d_y
            d_z = -jnp.ones_like(d_x)
        elif convention == "opencv":
            d_z = jnp.ones_like(d_x)
        else:
            raise ValueError(f"Unsupported camera convention {convention}.")
        dirs = jnp.stack([d_x, d_y, d_z], axis=-1)
        return dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    def sample_ijs_uniform(
        self,
        key: jax.Array,
        ijs: jnp.ndarray,
        num_samples: int,
        near_distances=None,
        far_distances=None,
        weights: Optional[jnp.ndarray] = None,
        boundaries: Optional[jnp.ndarray] = None,
        convention: str = "opengl",
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Sample points along rays through given pixels (camera.py:215-292).

        Two modes:
        - stratified-uniform in [near, far) (``weights``/``boundaries`` None);
          depth-guided sampling is handled by the caller exactly as in
          run_mapping.py:521-545;
        - weighted-bin: categorical draw over depth bins ``boundaries``
          (..., num_bins+1) with probabilities ``weights`` (..., num_bins),
          then uniform within each drawn bin (camera.py:278-288).

        Returns:
            points: Camera-frame points, shape (..., num_samples, 3).
            distances: Euclidean distances from origin, shape (..., num_samples).
        """
        leading_dims = ijs.shape[:-1]
        if (weights is None) != (boundaries is None):
            raise ValueError(
                "Either both or none of weights and boundaries must be None."
            )
        dirs = self.ijs_to_directions(ijs, convention=convention)

        if boundaries is None:
            near = jnp.broadcast_to(
                jnp.asarray(near_distances, jnp.float32), leading_dims
            )
            far = jnp.broadcast_to(
                jnp.asarray(far_distances, jnp.float32), leading_dims
            )
            deltas = (far - near) / num_samples
            edges = jnp.linspace(0.0, 1.0, num_samples + 1)[:-1]  # left edges
            u = jax.random.uniform(key, leading_dims + (num_samples,))
            distances = (
                deltas[..., None] * u
                + edges * (far - near)[..., None]
                + near[..., None]
            )
        else:
            key_bin, key_u = jax.random.split(key)
            num_bins = weights.shape[-1]
            # batched searchsorted over the weight CDF (static shapes; the
            # reference's torch.searchsorted, camera.py:279-282)
            cum_weights = jnp.cumsum(weights, axis=-1) + 1e-3
            r = jax.random.uniform(key_bin, leading_dims + (num_samples,))
            bins = jnp.sum(
                cum_weights[..., None, :] < r[..., :, None], axis=-1
            )
            bins = jnp.clip(bins, 0, num_bins - 1)
            bin_deltas = boundaries[..., 1:] - boundaries[..., :-1]
            bin_starts = jnp.take_along_axis(boundaries, bins, axis=-1)
            bin_sizes = jnp.take_along_axis(bin_deltas, bins, axis=-1)
            u = jax.random.uniform(key_u, leading_dims + (num_samples,))
            distances = bin_starts + bin_sizes * u
        points = dirs[..., None, :] * distances[..., None]
        return points, distances

    # -- depth conversions ---------------------------------------------------

    def _full_ijs(self) -> jnp.ndarray:
        rows = jnp.arange(self.height)
        cols = jnp.arange(self.width)
        ii, jj = jnp.meshgrid(rows, cols, indexing="ij")
        return jnp.stack([ii, jj], axis=-1).reshape(-1, 2)

    def distance_to_depth(
        self, distances: jnp.ndarray, ijs: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """Convert along-ray distances to z-depths (camera.py:294-317)."""
        if ijs is None:
            ijs = self._full_ijs().reshape(self.height, self.width, 2)
        dirs = self.ijs_to_directions(ijs, convention="opencv")
        return distances * dirs[..., 2]

    def depth_to_distance(
        self, depths: jnp.ndarray, ijs: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """Convert z-depths to along-ray distances (camera.py:319-340)."""
        if ijs is None:
            ijs = self._full_ijs().reshape(self.height, self.width, 2)
        dirs = self.ijs_to_directions(ijs, convention="opencv")
        return depths / dirs[..., 2]

    def depth_to_points_full(
        self, depth_image: jnp.ndarray, convention: str = "opengl"
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Back-project every pixel of a depth image (static shape).

        XLA-friendly replacement for the reference's dynamically-shaped
        ``depth_to_pointcloud`` (camera.py:342-395): returns all H*W points
        plus a validity mask (depth != 0).

        Returns:
            points: (H*W, 3) camera-frame points (invalid entries are zeros).
            ijs: (H*W, 2) integer (row, col) per point.
            valid: (H*W,) boolean mask, True where depth != 0.
        """
        fx, fy, cx, cy, _ = self.get_pinhole_camera_parameters(0.0)
        ijs = self._full_ijs()
        depth = depth_image.reshape(-1)
        xs = (ijs[:, 1].astype(depth.dtype) - cx) * depth / fx
        ys = (ijs[:, 0].astype(depth.dtype) - cy) * depth / fy
        if convention == "opengl":
            points = jnp.stack([xs, -ys, -depth], axis=-1)
        elif convention == "opencv":
            points = jnp.stack([xs, ys, depth], axis=-1)
        else:
            raise ValueError(f"Unsupported camera convention {convention}.")
        return points, ijs, depth != 0.0
