"""Batched geometric predicates in JAX.

TPU-native rebuild of the reference ``src/neural_graph_mapping/geometry.py``
(AABBs/Spheres/LineSegments classes). Functional style: every predicate is a
pure jnp function over explicitly-shaped arrays, fully vectorized so that the
field x ray intersection tests become dense (MXU/VPU-friendly) masks instead
of object-oriented broadcasting.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def spheres_to_aabbs(
    centers: jnp.ndarray, radii: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """AABB of each sphere (reference geometry.py:133-136).

    Args:
        centers: (..., 3). radii: scalar or (...).

    Returns:
        (minima, maxima), each (..., 3).
    """
    radii = jnp.broadcast_to(jnp.asarray(radii), centers.shape[:-1])[..., None]
    return centers - radii, centers + radii


def aabbs_intersect(
    min_a: jnp.ndarray,
    max_a: jnp.ndarray,
    min_b: jnp.ndarray,
    max_b: jnp.ndarray,
) -> jnp.ndarray:
    """Which AABBs in set B intersect which in set A (geometry.py:26-42).

    Shapes: A is (..., 3); B is (...b, 3). Returns (...b, ...a) boolean via
    broadcasting B against A (B's leading dims lead, matching the reference).
    """
    a_lead = min_a.shape[:-1]
    b_lead = min_b.shape[:-1]
    min_b = min_b.reshape(b_lead + (1,) * len(a_lead) + (3,))
    max_b = max_b.reshape(b_lead + (1,) * len(a_lead) + (3,))
    return jnp.all(min_b <= max_a, axis=-1) & jnp.all(max_b >= min_a, axis=-1)


def closest_points_on_segments(
    p1s: jnp.ndarray, p2s: jnp.ndarray, points: jnp.ndarray
) -> jnp.ndarray:
    """Closest point on each segment for each query point (geometry.py:86-105).

    Args:
        p1s, p2s: Segment endpoints, shape (...s, 3) (broadcast together).
        points: Query points, shape (...p, 3).

    Returns:
        (...p, ...s, 3): closest point on every segment for every query.
    """
    p1s, p2s = jnp.broadcast_arrays(p1s, p2s)
    s_lead = p1s.shape[:-1]
    p_lead = points.shape[:-1]
    dirs = p2s - p1s
    sq = jnp.sum(dirs * dirs, axis=-1, keepdims=True)
    sq = jnp.where(sq == 0.0, 1.0, sq)  # zero-length segments degrade to p1
    pts = points.reshape(p_lead + (1,) * len(s_lead) + (3,))
    t = jnp.sum((pts - p1s) * dirs, axis=-1, keepdims=True) / sq
    return p1s + dirs * jnp.clip(t, 0.0, 1.0)


def segments_intersect_spheres(
    p1s: jnp.ndarray,
    p2s: jnp.ndarray,
    centers: jnp.ndarray,
    radii,
) -> jnp.ndarray:
    """Which sphere intersects which line segment (geometry.py:67-84).

    Args:
        p1s, p2s: Segment endpoints (...s, 3).
        centers: Sphere centers (...c, 3). radii: scalar or (...c,).

    Returns:
        Boolean (...c, ...s).
    """
    p1s, p2s = jnp.broadcast_arrays(p1s, p2s)
    s_lead = p1s.shape[:-1]
    c_lead = centers.shape[:-1]
    closest = closest_points_on_segments(p1s, p2s, centers)  # (...c, ...s, 3)
    ctr = centers.reshape(c_lead + (1,) * len(s_lead) + (3,))
    dist_sq = jnp.sum((ctr - closest) ** 2, axis=-1)
    radii = jnp.broadcast_to(jnp.asarray(radii), c_lead)
    radii = radii.reshape(c_lead + (1,) * len(s_lead))
    return dist_sq <= radii**2


def rays_intersect_spheres(
    origins: jnp.ndarray,
    endpoints: jnp.ndarray,
    centers: jnp.ndarray,
    radii,
) -> jnp.ndarray:
    """Dense segment-vs-sphere test specialized for the target samplers.

    Same math as :func:`segments_intersect_spheres` but with the common shapes
    used by the single-view sampler (run_mapping.py:1520-1527): one shared
    origin, P endpoints, F spheres. Returns (F, P) boolean.
    """
    return segments_intersect_spheres(origins, endpoints, centers, radii)
