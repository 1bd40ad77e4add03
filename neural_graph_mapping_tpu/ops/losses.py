"""Loss functions for the mapping optimizer, in JAX.

Rebuild of the reference ``losses.py`` plus the loss assembly in
``NeuralGraphMap._compute_losses`` (run_mapping.py:1769-1872). Because XLA
requires static shapes, every loss takes an explicit boolean ``mask`` and
computes a masked mean instead of boolean indexing — numerically identical to
the reference's ``tensor[mask].mean()``.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def masked_mean(values: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean of values where mask is True; 0 if the mask is empty."""
    if mask is None:
        return jnp.mean(values)
    mask = jnp.broadcast_to(mask, values.shape).astype(values.dtype)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(values * mask) / denom


def photometric_loss(
    mode: str,
    measured_colors: jnp.ndarray,
    rendered_colors: jnp.ndarray,
    rendered_color_vars: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Photometric error (reference losses.py:10-38). mask broadcasts over (..., 3)."""
    if mask is not None and mask.ndim == measured_colors.ndim - 1:
        mask = mask[..., None]
    diff = rendered_colors - measured_colors
    if mode == "l1":
        return masked_mean(jnp.abs(diff), mask)
    if mode == "l2":
        return masked_mean(diff**2, mask)
    if mode == "gaussian_nll":
        nll = 0.5 * diff**2 / rendered_color_vars + 0.5 * jnp.log(rendered_color_vars)
        nll_mean = masked_mean(nll, mask)
        # reference falls back to L1 when the NLL blows up (losses.py:35-38)
        return jnp.where(nll_mean > 2.0, masked_mean(jnp.abs(diff), mask), nll_mean)
    raise ValueError(f"Unknown photometric loss mode {mode!r}")


def huber(residuals: jnp.ndarray, delta: float) -> jnp.ndarray:
    """Elementwise Huber loss, matching torch.nn.functional.huber_loss."""
    abs_r = jnp.abs(residuals)
    quad = 0.5 * residuals**2
    lin = delta * (abs_r - 0.5 * delta)
    return jnp.where(abs_r <= delta, quad, lin)


def depth_loss(
    mode: str,
    measured_depths: jnp.ndarray,
    rendered_depths: jnp.ndarray,
    rendered_depth_vars: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    huber_delta: float = 0.05,
) -> jnp.ndarray:
    """Depth error (reference losses.py:42-75)."""
    diff = rendered_depths - measured_depths
    if mode == "huber":
        return masked_mean(huber(diff, huber_delta), mask)
    if mode == "gaussian_nll":
        var = rendered_depth_vars + 1e-15
        nll = 0.5 * diff**2 / var + 0.5 * jnp.log(var)
        return masked_mean(nll, mask)
    if mode == "laplacian_nll":
        nll = jnp.abs(diff) / jnp.sqrt(0.5 * rendered_depth_vars + 1e-6) + 0.5 * jnp.log(
            2.0 * rendered_depth_vars + 1e-6
        )
        return masked_mean(nll, mask)
    raise ValueError(f"Unknown depth loss mode {mode!r}")


def termination_loss(
    pred_term_probs: jnp.ndarray,
    target_term_probs: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """MSE on ray termination probability (run_mapping.py:1803-1809)."""
    return masked_mean((pred_term_probs - target_term_probs) ** 2, mask)


def freespace_loss(
    sample_geometries: jnp.ndarray,
    truncation_distance: float,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Freespace loss: geometry in empty space should predict +truncation.

    The reference extracts masked samples and regresses
    ``g * trunc -> trunc`` (run_mapping.py:624-630, 1842-1847); here the mask
    (sample in front of the surface by > truncation, with valid depth) is
    applied via masked mean.
    """
    residual = sample_geometries * truncation_distance - truncation_distance
    return masked_mean(residual**2, mask)


def tsdf_loss(
    sample_geometries: jnp.ndarray,
    deltas: jnp.ndarray,
    truncation_distance: float,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Truncated-SDF loss near the surface (run_mapping.py:632-639, 1849-1852).

    deltas = gt_distance - sample_distance; supervise g * trunc ~= delta where
    |delta| < trunc and depth is valid (mask).
    """
    residual = sample_geometries * truncation_distance - deltas
    return masked_mean(residual**2, mask)


def eikonal_term(gradients: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Squared deviation of SDF gradient norm from 1 (reference losses.py:78-96).

    Takes precomputed spatial gradients (..., 3) (obtain via jax.grad/jvp of the
    field geometry w.r.t. points) rather than replaying autograd graphs.
    """
    norms = jnp.linalg.norm(gradients, axis=-1)
    return masked_mean((norms - 1.0) ** 2, mask)
