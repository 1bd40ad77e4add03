"""Positional encodings with a common functional interface, in JAX.

TPU-native rebuild of the reference ``positional_encodings.py`` plus the
external CUDA ``permutohedral_encoding`` package it wraps
(reference positional_encodings.py:19-66; pinned in /pyproject.toml:20).

Every encoding is a functional module:

- ``init(key) -> params``: learnable parameter pytree (possibly empty dict).
- ``apply(params, points) -> features``: pure function, jit/vmap-safe.
- ``get_out_dim() -> int``.

The parameter pytrees get a leading *field* axis when stacked into a
:class:`~neural_graph_mapping_tpu.models.fields.NeuralFieldSet`, and the whole
field (encoding + MLP) is evaluated under ``jax.vmap`` — the TPU equivalent of
the reference's ``torch.vmap(functional_call(...))`` path (models.py:342-345).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from neural_graph_mapping_tpu.ops import permuto

Params = Dict[str, jnp.ndarray]


class PermutohedralEncoding:
    """Multiresolution permutohedral-lattice hash encoding (TPU-tuned).

    Functional equivalent of the CUDA ``permutohedral_encoding.PermutoEncoding``
    as configured by the reference (positional_encodings.py:19-66,
    config/neural_graph_map.yaml:6-14): ``nr_levels`` geometric scales between
    ``coarsest_scale`` and ``finest_scale``; at each level the query point is
    embedded onto the permutohedral lattice A_d (simplex interpolation: only
    d+1 = 4 taps per level in 3D instead of 2^d = 8 for a cubic lattice), the
    d+1 simplex corners are hashed into a per-level table of
    ``2**log2_hashmap_size`` entries, and the gathered features are
    barycentrically blended.

    Lattice math follows Adams, Baek, Davis, "Fast High-Dimensional Filtering
    Using the Permutohedral Lattice" (CGF 2010) — elevation to the sum-zero
    hyperplane, greedy rounding to the nearest remainder-0 point, rank
    computation, and canonical-simplex corner enumeration — vectorized over
    points with static d.

    The hash table is a *parameter* (leading level axis), so when fields are
    stacked the table carries a leading field axis and vmaps cleanly.
    Per-level random shifts are identical across fields (the reference
    replicates the prototype's buffers across fields, models.py:245-264), so
    they are baked in as module constants from a fixed seed.
    """

    def __init__(
        self,
        pos_dim: int,
        log2_hashmap_size: int,
        nr_levels: int,
        nr_feat_per_level: int,
        coarsest_scale: float,
        finest_scale: float,
        appply_random_shift_per_level: bool = True,  # (sic) reference arg name
        concat_points: bool = False,
        concat_points_scaling: float = 1.0,
        init_scale: float = 1e-5,
        shift_seed: int = 0,
        per_level_capacities: bool = True,
    ) -> None:
        # per_level_capacities=False hashes EVERY level at the full table
        # size like the reference CUDA extension — required when importing
        # reference-trained tables (scripts/refrun/import_reference_ckpt.py),
        # whose coarse-level entries live at full-range hash indices.
        self._per_level_capacities = bool(per_level_capacities)
        self.pos_dim = int(pos_dim)
        self.capacity = int(2**log2_hashmap_size)
        self.nr_levels = int(nr_levels)
        self.nr_feat_per_level = int(nr_feat_per_level)
        self.init_scale = float(init_scale)
        self.concat_points = bool(concat_points)
        self.concat_points_scaling = float(concat_points_scaling)
        # geomspace coarsest -> finest (positional_encodings.py:50)
        self.scales = np.geomspace(coarsest_scale, finest_scale, num=nr_levels).astype(
            np.float32
        )
        d = self.pos_dim
        if appply_random_shift_per_level:
            rng = np.random.RandomState(shift_seed)
            self._shifts = jnp.asarray(
                rng.uniform(0.0, 10.0, size=(nr_levels, d)).astype(np.float32)
            )
        else:
            self._shifts = jnp.zeros((nr_levels, d), dtype=jnp.float32)
        # Elevation scale: normalize so that lattice spacing ~ `scale` in
        # euclidean space. sigma_i = 1/sqrt((i+1)(i+2)) is the standard
        # column normalization of the elevation basis E.
        self._elev_scale = jnp.asarray(permuto.make_elevation_scale(d))
        # static tuples baked into the fused Pallas kernel (hashable)
        self._scales_t = tuple(float(s) for s in self.scales)
        self._shifts_t = tuple(tuple(float(x) for x in row) for row in np.asarray(self._shifts))
        self._elev_t = tuple(float(e) for e in np.asarray(self._elev_scale))
        # Per-level EFFECTIVE table sizes: coarse levels touch few lattice
        # cells over the local unit domain, so their hash range shrinks to a
        # power of two with 2x headroom over the probed cell count — low-
        # collision (indices are still XOR-multiply hashes masked to the
        # range, not injective), while storage stays (L, F, T) rectangular.
        # Shortens the Pallas gather sweep on those levels; fine levels stay
        # at full capacity. (The reference's CUDA extension hashes every
        # level at full T.)
        if self.pos_dim == 3 and self._per_level_capacities:
            caps = []
            shifts_np = np.asarray(self._shifts)
            elev_np = np.asarray(self._elev_scale)
            hashed = False  # once a level is hashed, all finer ones are too
            for l, scale in enumerate(self._scales_t):
                if hashed:
                    caps.append(self.capacity)
                    continue
                n_cells = permuto.count_lattice_cells(scale, shifts_np[l], elev_np)
                cap = 128
                while cap < 2 * n_cells:  # 2x headroom over the probe count
                    cap *= 2
                if cap >= self.capacity:
                    cap = self.capacity
                    hashed = True
                caps.append(cap)
            self.level_capacities = tuple(caps)
        else:
            self.level_capacities = (self.capacity,) * self.nr_levels

    def get_out_dim(self) -> int:
        out = self.nr_levels * self.nr_feat_per_level
        if self.concat_points:
            out += self.pos_dim
        return out

    def init(self, key: jax.Array) -> Params:
        # Table layout (F, 2, L, T) stacked -> per-field (2, L, T): the
        # feature axis is MAJOR so the minor matrix is (L, T), whose DEFAULT
        # XLA layout tiles T(8,128) — exactly what the Pallas kernels and the
        # Adam element-wise updates want. The previous (L, 2, T) layout put
        # the size-2 feature dim in the minor pair (T(2,128) default), and
        # XLA relayout-copied the params + both Adam moments at every jit
        # boundary: ~1.3 ms/frame on v5e (measured r3).
        table = self.init_scale * jax.random.uniform(
            key,
            (self.nr_feat_per_level, self.nr_levels, self.capacity),
            minval=-1.0,
            maxval=1.0,
        )
        return {"table": table}

    # -- lattice + gather (see ops/permuto.py for the TPU-tuned core) --------

    def _lattice_keys_and_weights(self, points: jnp.ndarray):
        """Corner hash indices + barycentric weights for all levels.

        Args:
            points: (P, d).

        Returns:
            idx: (L, d+1, P) int32 hash-table indices (points-minor layout).
            w: (L, d+1, P) float barycentric weights.
        """
        return permuto.lattice_keys_and_weights(
            points,
            jnp.asarray(self.scales),
            self._shifts,
            self._elev_scale,
            self.level_capacities,
        )

    def apply_fm_soa(self, params: Params, coords) -> jnp.ndarray:
        """Feature-major encode from SoA coords (d arrays of (P,)) -> (out_dim, P).

        The hot path: every tensor keeps points in the minor (lane) dimension
        end to end (lattice math, hash gather, blend), which is the layout
        the TPU wants; the generic channels-last :meth:`apply` wraps this
        with edge slices/transposes.

        On TPU (3D, 2 feats/level) the whole encode runs as ONE fused Pallas
        kernel (lattice + lookup + blend; fused backward straight to table
        gradients). Note the fused path does not propagate point gradients —
        use :meth:`apply` for eikonal-style losses.
        """
        table = params["table"]  # (F, L, T) feature-MAJOR (see init)
        if (
            permuto._use_pallas()
            and self.pos_dim == 3
            and self.nr_feat_per_level == 2
        ):
            stacked = jnp.stack(coords, axis=0)  # (3, P): major-dim stack
            out = permuto.encode_fused(
                table, stacked, self._scales_t, self._shifts_t, self._elev_t,
                self.level_capacities,
            )
            if self.concat_points:
                out = jnp.concatenate(
                    [out]
                    + [self.concat_points_scaling * c[None, :] for c in coords],
                    axis=0,
                )
            return out
        idx, w = permuto.lattice_keys_and_weights_soa(
            coords, jnp.asarray(self.scales), self._shifts, self._elev_scale,
            self.level_capacities,
        )  # (L, K, P)
        out = permuto.gather_blend(table, idx, w)  # (L*F, P)
        if self.concat_points:
            out = jnp.concatenate(
                [out] + [self.concat_points_scaling * c[None, :] for c in coords],
                axis=0,
            )
        return out

    def apply_fm(self, params: Params, points: jnp.ndarray) -> jnp.ndarray:
        """Feature-major encode: points (P, d) -> (out_dim, P)."""
        coords = tuple(points[..., i] for i in range(self.pos_dim))
        return self.apply_fm_soa(params, coords)

    def apply(self, params: Params, points: jnp.ndarray) -> jnp.ndarray:
        """Encode points (..., d) -> (..., nr_levels * nr_feat_per_level [+ d])."""
        lead = points.shape[:-1]
        flat = points.reshape(-1, self.pos_dim)
        out = self.apply_fm(params, flat).T  # edge transpose for generic API
        return out.reshape(lead + (self.get_out_dim(),))


class TriplaneEncoding:
    """Learned triplane encoding (reference positional_encodings.py:69-161).

    Three axis-aligned feature planes sampled bilinearly (align_corners=True,
    border padding) at the projections of each query point, combined by sum,
    product, or concatenation. Expects inputs in [-1, 1].
    """

    def __init__(
        self,
        resolution: int = 32,
        num_components: int = 64,
        init_scale: float = 0.1,
        mode: str = "sum",
    ) -> None:
        if mode not in ("sum", "product", "concat"):
            raise ValueError(f"{mode=} is not supported.")
        self.resolution = int(resolution)
        self.num_components = int(num_components)
        self.init_scale = float(init_scale)
        self.mode = mode

    def get_out_dim(self) -> int:
        if self.mode == "concat":
            return 3 * self.num_components
        return self.num_components

    def init(self, key: jax.Array) -> Params:
        planes = self.init_scale * jax.random.normal(
            key, (3, self.num_components, self.resolution, self.resolution)
        )
        return {"planes": planes}

    @staticmethod
    def _grid_sample_bilinear(plane: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
        """Bilinear sample: plane (C, R, R), coords (..., 2) in [-1, 1].

        align_corners=True, border padding — matching
        ``torch.nn.functional.grid_sample`` as used by the reference
        (positional_encodings.py:146-148). coords[..., 0] indexes the last
        (width/x) axis, coords[..., 1] the height/y axis.
        """
        c, h, w = plane.shape
        x = (coords[..., 0] + 1.0) * 0.5 * (w - 1)
        y = (coords[..., 1] + 1.0) * 0.5 * (h - 1)
        x = jnp.clip(x, 0.0, w - 1)
        y = jnp.clip(y, 0.0, h - 1)
        x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
        y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
        tx = x - x0
        ty = y - y0
        f00 = plane[:, y0, x0]
        f01 = plane[:, y0, x0 + 1]
        f10 = plane[:, y0 + 1, x0]
        f11 = plane[:, y0 + 1, x0 + 1]
        top = f00 * (1 - tx) + f01 * tx
        bot = f10 * (1 - tx) + f11 * tx
        out = top * (1 - ty) + bot * ty  # (C, ...)
        return jnp.moveaxis(out, 0, -1)  # (..., C)

    def apply(self, params: Params, points: jnp.ndarray) -> jnp.ndarray:
        planes = params["planes"]
        coords = jnp.stack(
            [points[..., (0, 1)], points[..., (0, 2)], points[..., (1, 2)]], axis=0
        )  # (3, ..., 2)
        feats = jax.vmap(self._grid_sample_bilinear)(planes, coords)  # (3, ..., C)
        if self.mode == "sum":
            return jnp.sum(feats, axis=0)
        if self.mode == "product":
            return jnp.prod(feats, axis=0)
        return jnp.concatenate([feats[0], feats[1], feats[2]], axis=-1)


class PositionalEncodingFourier:
    """Random Fourier features (reference positional_encodings.py:164-216)."""

    def __init__(
        self, dim_in: int, dim_out: int, mu: float, sigma: float, raw_coords: bool
    ) -> None:
        self.dim_in = int(dim_in)
        self.dim_out = int(dim_out)
        self.mu = float(mu)
        self.sigma = float(sigma)
        self.raw_coords = bool(raw_coords)
        self._n_features = self.dim_out - self.dim_in if raw_coords else self.dim_out

    def get_out_dim(self) -> int:
        return self.dim_out

    def init(self, key: jax.Array) -> Params:
        w = self.mu + self.sigma * jax.random.normal(
            key, (self.dim_in, self._n_features)
        )
        return {"fourier_w": w}

    def apply(self, params: Params, points: jnp.ndarray) -> jnp.ndarray:
        feats = jnp.sin(points @ params["fourier_w"])
        if self.raw_coords:
            return jnp.concatenate([points, feats], axis=-1)
        return feats


class PositionalEncodingNeRF:
    """Sin/cos octave encoding (reference positional_encodings.py:219-276)."""

    def __init__(self, dim_in: int, num_octaves: int = 8, start_octave: int = 0) -> None:
        self.dim_in = int(dim_in)
        self.num_octaves = int(num_octaves)
        self.start_octave = int(start_octave)

    def get_out_dim(self) -> int:
        return self.dim_in * self.num_octaves * 2

    def init(self, key: jax.Array) -> Params:
        return {}

    def apply(self, params: Params, points: jnp.ndarray) -> jnp.ndarray:
        octaves = jnp.arange(
            self.start_octave, self.start_octave + self.num_octaves, dtype=points.dtype
        )
        mult = (2.0**octaves) * jnp.pi
        scaled = points[..., None] * mult  # (..., dim_in, num_octaves)
        lead = points.shape[:-1]
        sines = jnp.sin(scaled).reshape(lead + (-1,))
        cosines = jnp.cos(scaled).reshape(lead + (-1,))
        return jnp.concatenate([sines, cosines], axis=-1)
