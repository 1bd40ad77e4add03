"""CPU stand-in for the CUDA ``permutohedral_encoding`` package (pure torch).

Lets the *reference* implementation (/root/reference) run on CPU for a direct
quality cross-check against this repo (VERDICT r4 item 2). Implements the same
permutohedral lattice semantics as our JAX port
(neural_graph_mapping_tpu/ops/permuto.py — Adams/Baek/Davis CGF 2010 lattice,
instant-ngp style XOR-multiply hashing, identical hash primes and per-level
random-shift distribution/seed) so that the two code bases differ only in
engine semantics (sampling, quadrature, losses, schedules), not in encoding
capacity.

API mirrors the fork the reference pins (roym899/permutohedral_encoding):
``PermutoEncoding(pos_dim, capacity, nr_levels, nr_feat_per_level,
scale_per_level, apply_random_shift_per_level, concat_points,
concat_points_scaling, init_scale=...)``, ``forward(points) -> (..., L*F)``,
``output_dims()``. vmap-compatible: only elementwise math + ``torch.gather``.
"""

import numpy as np
import torch

HASH_PRIMES = (1, 2654435761, 805459861, 3674653429)


def _make_elevation_scale(d: int) -> np.ndarray:
    return np.asarray(
        [1.0 / np.sqrt((i + 1) * (i + 2)) for i in range(d)], dtype=np.float32
    ) * (d + 1)


class PermutoEncoding(torch.nn.Module):
    def __init__(
        self,
        pos_dim: int,
        capacity: int,
        nr_levels: int,
        nr_feat_per_level: int,
        scale_per_level,
        apply_random_shift_per_level: bool = True,
        concat_points: bool = False,
        concat_points_scaling: float = 1.0,
        init_scale: float = 1e-5,
        level_capacities=None,
    ) -> None:
        super().__init__()
        self.pos_dim = int(pos_dim)
        self.capacity = int(capacity)
        self.nr_levels = int(nr_levels)
        self.nr_feat_per_level = int(nr_feat_per_level)
        self.concat_points = bool(concat_points)
        self.concat_points_scaling = float(concat_points_scaling)
        scales = np.asarray(scale_per_level, dtype=np.float32)
        assert scales.shape == (self.nr_levels,)
        d = self.pos_dim
        if apply_random_shift_per_level:
            # same distribution + seed as neural_graph_mapping_tpu
            rng = np.random.RandomState(0)
            shifts = rng.uniform(0.0, 10.0, size=(self.nr_levels, d)).astype(np.float32)
        else:
            shifts = np.zeros((self.nr_levels, d), dtype=np.float32)
        # per-level power-of-two hash capacities (cross-eval of checkpoints
        # trained with neural_graph_mapping_tpu's compacted coarse levels);
        # None = the fork's behavior, every level hashed at full capacity.
        # float32 buffer so requires_grad_() in the reference's
        # _set_vmap_fields doesn't choke on an integer tensor; never receives
        # gradients (used only through .long()).
        if level_capacities is None:
            caps = np.full(self.nr_levels, self.capacity, dtype=np.float32)
        else:
            caps = np.asarray(level_capacities, dtype=np.float32)
            assert caps.shape == (self.nr_levels,)
        self.register_buffer("_cap_mask", torch.from_numpy(caps - 1.0))
        self.register_buffer("_scales", torch.from_numpy(scales))
        self.register_buffer("_shifts", torch.from_numpy(shifts))
        self.register_buffer(
            "_elev_scale", torch.from_numpy(_make_elevation_scale(d))
        )
        table = init_scale * (
            2.0 * torch.rand(self.nr_levels, self.capacity, self.nr_feat_per_level) - 1.0
        )
        self.lattice_values = torch.nn.Parameter(table)

    def output_dims(self) -> int:
        out = self.nr_levels * self.nr_feat_per_level
        if self.concat_points:
            out += self.pos_dim
        return out

    def _lattice(self, pts: torch.Tensor):
        """pts (P, d) -> idx (L, d+1, P) int64, w (L, d+1, P).

        scales/shifts/elev are DETACHED: the CUDA extension this shims only
        computes gradients for ``lattice_values`` (and optionally the query
        points), so under the real reference these buffers never train. The
        reference stacks + optimizes every state-dict tensor
        (run_mapping.py:676-679), which on a fully-differentiable torch port
        would silently grant it extra per-field DOF the CUDA build lacks —
        measured r4: shifts drifted 0.42, coarsest scale 0.34 over a 120-frame
        run before this detach.
        """
        d = self.pos_dim
        scales = self._scales.detach()  # (L,)
        shifts = self._shifts.detach()
        elev = self._elev_scale.detach()
        cfs = [
            (pts[None, :, i] / scales[:, None] + shifts[:, i, None]) * elev[i]
            for i in range(d)
        ]  # each (L, P)

        suffix = [None] * (d + 1)
        suffix[d] = torch.zeros_like(cfs[0])
        for i in range(d - 1, -1, -1):
            suffix[i] = suffix[i + 1] + cfs[i]
        elevated = [suffix[0]] + [suffix[i] - i * cfs[i - 1] for i in range(1, d + 1)]

        down = 1.0 / (d + 1)
        rem0 = [torch.round(e * down) * (d + 1) for e in elevated]
        diff = [e - r for e, r in zip(elevated, rem0)]

        rank = [torch.zeros_like(diff[0], dtype=torch.int32) for _ in range(d + 1)]
        for i in range(d + 1):
            for j in range(i + 1, d + 1):
                i_smaller = diff[i] < diff[j]
                rank[i] = rank[i] + i_smaller.to(torch.int32)
                rank[j] = rank[j] + (~i_smaller).to(torch.int32)

        s = torch.round(sum(rem0) * down).to(torch.int32)
        for i in range(d + 1):
            r = rank[i] + s
            low = r < 0
            high = r > d
            rank[i] = r + torch.where(low, d + 1, 0) - torch.where(high, d + 1, 0)
            rem0[i] = (
                rem0[i]
                + torch.where(low, float(d + 1), 0.0)
                - torch.where(high, float(d + 1), 0.0)
            )

        v = [(e - r) * down for e, r in zip(elevated, rem0)]
        bary = [torch.zeros_like(v[0]) for _ in range(d + 2)]
        for i in range(d + 1):
            for b in range(d + 2):
                hit_hi = (d - rank[i]) == b
                hit_lo = (d + 1 - rank[i]) == b
                bary[b] = (
                    bary[b]
                    + torch.where(hit_hi, v[i], torch.zeros_like(v[i]))
                    - torch.where(hit_lo, v[i], torch.zeros_like(v[i]))
                )
        bary[0] = bary[0] + 1.0 + bary[d + 1]
        w = torch.stack(bary[: d + 1], dim=1)  # (L, d+1, P)

        cap_mask = self._cap_mask.detach().long()[:, None]  # (L, 1)
        idx_corners = []
        for k in range(d + 1):
            h = torch.zeros_like(rank[0], dtype=torch.int64)
            for i in range(d):
                offset = torch.where(rank[i] < (d + 1 - k), k, k - (d + 1))
                key_i = (rem0[i].to(torch.int64) + offset) & 0xFFFFFFFF
                h = h ^ ((key_i * HASH_PRIMES[i]) & 0xFFFFFFFF)
            idx_corners.append(h & cap_mask)
        idx = torch.stack(idx_corners, dim=1)  # (L, d+1, P)
        return idx, w

    def forward(self, points: torch.Tensor) -> torch.Tensor:
        lead = points.shape[:-1]
        d = self.pos_dim
        pts = points.reshape(-1, d)
        idx, w = self._lattice(pts)  # (L, K, P)
        L, K, P = idx.shape
        F = self.nr_feat_per_level
        flat_idx = idx.reshape(L, K * P, 1).expand(L, K * P, F)
        feats = torch.gather(self.lattice_values, 1, flat_idx).reshape(L, K, P, F)
        out = (feats * w.unsqueeze(-1)).sum(dim=1)  # (L, P, F)
        out = out.permute(1, 0, 2).reshape(P, L * F)
        if self.concat_points:
            out = torch.cat([out, self.concat_points_scaling * pts], dim=-1)
        return out.reshape(*lead, self.output_dims())
