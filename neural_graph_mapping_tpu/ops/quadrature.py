"""Volume-rendering quadrature (alpha compositing) in JAX.

Rebuild of the reference ``NeuralGraphMap._quadrature``
(run_mapping.py:709-799): converts per-sample geometry predictions into
occupancy probabilities under one of four geometry parameterizations, then
alpha-composites expected color/depth plus variances and ray termination
probability. Pure jnp, static shapes, fully fused by XLA into the training
step.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class QuadratureResult(NamedTuple):
    colors: jnp.ndarray  # (..., 3) expected ray color
    depths: jnp.ndarray  # (...,) expected termination z-depth
    color_vars: jnp.ndarray  # (..., 3)
    depth_vars: jnp.ndarray  # (...,)
    term_probs: jnp.ndarray  # (...,) P(ray terminates before far plane)
    sample_weights: jnp.ndarray  # (..., S or S-1)


def occupancy_probs(
    geometry_mode: str,
    sample_geometries: jnp.ndarray,
    sample_distances: jnp.ndarray,
    geometry_factor: float,
    neus_isds: Optional[jnp.ndarray] = None,
):
    """Per-sample occupancy probability + whether the last sample is dropped.

    Mirrors the four modes in run_mapping.py:746-762:
      - density: NeRF, 1 - exp(-delta * relu(sigma)); uses S-1 intervals.
      - occupancy: sigmoid(factor * g).
      - neus: clamped CDF ratio of sigmoid(isds * factor * g); S-1 intervals.
      - nrgbd: 4 * sigmoid(g') * sigmoid(-g') bell around the surface.
    """
    if geometry_mode == "density":
        deltas = sample_distances[..., 1:] - sample_distances[..., :-1]
        occ = 1.0 - jnp.exp(-deltas * jnp.maximum(sample_geometries[..., :-1], 0.0))
        drops_last = True
    elif geometry_mode == "occupancy":
        occ = 1.0 / (1.0 + jnp.exp(-geometry_factor * sample_geometries))
        drops_last = False
    elif geometry_mode == "neus":
        if neus_isds is None:
            raise ValueError("neus mode requires neus_isds")
        tno = 1.0 / (1.0 + jnp.exp(-neus_isds * geometry_factor * sample_geometries))
        occ = jnp.maximum((tno[..., :-1] - tno[..., 1:]) / (tno[..., :-1] + 1e-5), 0.0)
        drops_last = True
    elif geometry_mode == "nrgbd":
        # symmetric bell around the surface: 4*s(t)*s(-t) == 4*s(t)*(1-s(t))
        t = geometry_factor * sample_geometries
        sig = 1.0 / (1.0 + jnp.exp(-t))
        occ = 4.0 * sig * (1.0 - sig)
        drops_last = False
    else:
        raise ValueError(f"Unknown geometry_mode {geometry_mode!r}")
    return occ, drops_last


def quadrature(
    geometry_mode: str,
    sample_colors: jnp.ndarray,
    sample_geometries: jnp.ndarray,
    sample_distances: jnp.ndarray,
    sample_depths: jnp.ndarray,
    geometry_factor: float = 1.0,
    neus_isds: Optional[jnp.ndarray] = None,
) -> QuadratureResult:
    """Alpha-composite samples along rays (run_mapping.py:709-799).

    Args:
        geometry_mode: One of density/occupancy/neus/nrgbd.
        sample_colors: (..., S, 3).
        sample_geometries: (..., S) raw field geometry output.
        sample_distances: (..., S) distances along ray (sorted ascending).
        sample_depths: (..., S) z-depths of samples.
        geometry_factor: Scale applied to geometry before the squashing.
        neus_isds: Inverse std-dev per field, broadcastable to geometries.
    """
    occ, drops_last = occupancy_probs(
        geometry_mode, sample_geometries, sample_distances, geometry_factor, neus_isds
    )
    lead = occ.shape[:-1]
    non_term = jnp.concatenate(
        [jnp.ones(lead + (1,), occ.dtype), jnp.cumprod(1.0 - occ[..., :-1], axis=-1)],
        axis=-1,
    )
    weights = occ * non_term  # per-sample termination probability
    bg_weight = 1.0 - jnp.sum(weights, axis=-1)

    last = -1 if drops_last else None
    colors = jnp.sum(sample_colors[..., :last, :] * weights[..., None], axis=-2)
    depths = jnp.sum(sample_depths[..., :last] * weights, axis=-1)
    color_vars = jnp.sum(
        weights[..., None] * (colors[..., None, :] - sample_colors[..., :last, :]) ** 2,
        axis=-2,
    )
    depth_vars = jnp.sum(
        weights * (depths[..., None] - sample_depths[..., :last]) ** 2, axis=-1
    )
    return QuadratureResult(
        colors=colors,
        depths=depths,
        color_vars=color_vars,
        depth_vars=depth_vars,
        term_probs=1.0 - bg_weight,
        sample_weights=weights,
    )


class QuadratureResultFM(NamedTuple):
    colors: jnp.ndarray  # (F, 3, R) channel-major expected ray colors
    depths: jnp.ndarray  # (F, R)
    color_vars: jnp.ndarray  # (F, 3, R)
    depth_vars: jnp.ndarray  # (F, R)
    term_probs: jnp.ndarray  # (F, R)


def quadrature_fm(
    geometry_mode: str,
    sample_colors: jnp.ndarray,  # (F, 3, R, S) channel-major
    sample_geometries: jnp.ndarray,  # (F, R, S)
    sample_distances: jnp.ndarray,  # (F, R, S)
    sample_depths: jnp.ndarray,  # (F, R, S)
    geometry_factor: float = 1.0,
    neus_isds: Optional[jnp.ndarray] = None,
) -> QuadratureResultFM:
    """Channel-major variant of :func:`quadrature` for the training hot path:
    colors keep channels on a MAJOR axis so no tensor ever has a tiny minor
    dimension (TPU lane utilization)."""
    occ, drops_last = occupancy_probs(
        geometry_mode, sample_geometries, sample_distances, geometry_factor, neus_isds
    )
    lead = occ.shape[:-1]
    non_term = jnp.concatenate(
        [jnp.ones(lead + (1,), occ.dtype), jnp.cumprod(1.0 - occ[..., :-1], axis=-1)],
        axis=-1,
    )
    weights = occ * non_term
    bg_weight = 1.0 - jnp.sum(weights, axis=-1)

    last = -1 if drops_last else None
    colors = jnp.einsum("fcrs,frs->fcr", sample_colors[..., :last], weights)
    depths = jnp.sum(sample_depths[..., :last] * weights, axis=-1)
    color_vars = jnp.einsum(
        "fcrs,frs->fcr",
        (colors[..., None] - sample_colors[..., :last]) ** 2,
        weights,
    )
    depth_vars = jnp.sum(
        weights * (depths[..., None] - sample_depths[..., :last]) ** 2, axis=-1
    )
    return QuadratureResultFM(
        colors=colors,
        depths=depths,
        color_vars=color_vars,
        depth_vars=depth_vars,
        term_probs=1.0 - bg_weight,
    )
