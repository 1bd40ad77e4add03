"""Rigid-transform, quaternion, and 2D-complex rotation math in JAX.

TPU-native replacement for the reference's use of ``pytorch3d.transforms``
(quaternion apply/invert/matrix conversion; see reference
``src/neural_graph_mapping/utils.py:270-287`` and ``models.py:12-63``).
Quaternions are real-first (w, x, y, z); complex numbers are real-first (re, im).

All functions are pure jnp and safe to call inside ``jax.jit`` / ``jax.vmap``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Quaternions (real-first, wxyz)
# ---------------------------------------------------------------------------


def quaternion_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of two quaternions. Shapes broadcast; last dim 4."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quaternion_invert(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a unit quaternion (conjugate). Shape (..., 4)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quaternion_apply(q: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """Rotate 3D points by unit quaternions. Broadcasts; point shape (..., 3).

    Uses the expanded form q * (0, p) * q^-1 without building intermediate
    quaternions twice (standard Rodrigues-like identity).
    """
    w = q[..., :1]
    v = q[..., 1:]
    t = 2.0 * jnp.cross(v, point)
    return point + w * t + jnp.cross(v, t)


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Convert unit quaternions (..., 4) to rotation matrices (..., 3, 3)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quaternion(m: jnp.ndarray) -> jnp.ndarray:
    """Convert rotation matrices (..., 3, 3) to real-first unit quaternions.

    Branch-free: computes all four candidate quaternions (one per largest
    component) and selects the numerically best, so it is jit/vmap-safe.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Squared magnitudes of (w, x, y, z), clipped at 0 for numerical safety.
    q_abs_sq = jnp.stack(
        [
            1.0 + m00 + m11 + m22,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ],
        axis=-1,
    )
    q_abs = jnp.sqrt(jnp.maximum(q_abs_sq, 0.0))

    # Candidate quaternions, each exact when its pivot component dominates.
    quat_w = jnp.stack([q_abs_sq[..., 0], m21 - m12, m02 - m20, m10 - m01], -1)
    quat_x = jnp.stack([m21 - m12, q_abs_sq[..., 1], m10 + m01, m02 + m20], -1)
    quat_y = jnp.stack([m02 - m20, m10 + m01, q_abs_sq[..., 2], m12 + m21], -1)
    quat_z = jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs_sq[..., 3]], -1)
    candidates = jnp.stack([quat_w, quat_x, quat_y, quat_z], axis=-2)

    denom = 2.0 * jnp.maximum(q_abs, 1e-12)[..., None]
    candidates = candidates / denom

    best = jnp.argmax(q_abs_sq, axis=-1)
    quat = jnp.take_along_axis(
        candidates, best[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]
    # Canonicalize sign (w >= 0).
    return jnp.where(quat[..., :1] < 0, -quat, quat)


# ---------------------------------------------------------------------------
# 2D rotations as complex numbers (real-first), for dim_points == 2 fields
# (reference models.py:12-63)
# ---------------------------------------------------------------------------


def complex_invert(c: jnp.ndarray) -> jnp.ndarray:
    """Conjugate of real-first complex numbers (..., 2)."""
    return c * jnp.asarray([1.0, -1.0], dtype=c.dtype)


def complex_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Product of real-first complex numbers (..., 2); broadcasts."""
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    return jnp.stack([ar * br - ai * bi, ar * bi + br * ai], axis=-1)


def complex_apply(c: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """Rotate 2D points by a complex rotation (..., 2)."""
    return complex_multiply(c, point)


# ---------------------------------------------------------------------------
# Homogeneous 4x4 transforms
# ---------------------------------------------------------------------------


def transform_points(
    points: jnp.ndarray, transforms: jnp.ndarray, inv: bool = False
) -> jnp.ndarray:
    """Apply (or inverse-apply) rigid 4x4 transforms to 3D points.

    Equivalent to the reference ``utils.transform_points`` (utils.py:276-287):
    broadcasting einsum over the rotation block plus translation.

    Args:
        points: Shape (..., 3).
        transforms: Shape (..., 4, 4), broadcastable against points' leading dims.
        inv: If True, applies the inverse transform (assumes rigid: R^T).
    """
    rot = transforms[..., :3, :3]
    trans = transforms[..., :3, 3]
    if inv:
        return jnp.einsum("...kd,...k->...d", rot, points - trans)
    return jnp.einsum("...dk,...k->...d", rot, points) + trans


def transform_quaternions(
    quaternions: jnp.ndarray, transforms: jnp.ndarray
) -> jnp.ndarray:
    """Rotate orientations (real-first quats) by the rotation of 4x4 transforms.

    Matches reference ``utils.transform_quaternions`` (utils.py:270-273).
    """
    rot_quats = matrix_to_quaternion(transforms[..., :3, :3])
    return quaternion_multiply(rot_quats, quaternions)


def invert_rigid(transforms: jnp.ndarray) -> jnp.ndarray:
    """Invert rigid 4x4 transforms without a general solve."""
    rot = transforms[..., :3, :3]
    trans = transforms[..., :3, 3]
    rot_t = jnp.swapaxes(rot, -1, -2)
    new_trans = -jnp.einsum("...dk,...k->...d", rot_t, trans)
    out = jnp.zeros_like(transforms)
    out = out.at[..., :3, :3].set(rot_t)
    out = out.at[..., :3, 3].set(new_trans)
    out = out.at[..., 3, 3].set(1.0)
    return out


def to_homogeneous(x: jnp.ndarray) -> jnp.ndarray:
    """Append a 1 to the last dimension (reference utils.py:176-187)."""
    return jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)


def to_inhomogeneous(x: jnp.ndarray, normalize: bool = False) -> jnp.ndarray:
    """Drop the last element of the trailing dim, optionally normalizing."""
    if normalize:
        x = x / x[..., -1:]
    return x[..., :-1]


# ---------------------------------------------------------------------------
# Trajectory alignment (host-side; replaces `evo` Umeyama,
# reference slam_dataset.py:282-319)
# ---------------------------------------------------------------------------


def umeyama_alignment(
    src: np.ndarray, dst: np.ndarray, with_scale: bool = False
) -> np.ndarray:
    """Least-squares rigid alignment dst ~= T @ src (Umeyama 1991).

    Args:
        src: Source points, shape (N, 3) (e.g. estimated trajectory positions).
        dst: Target points, shape (N, 3) (e.g. ground-truth positions).
        with_scale: Whether to also estimate a similarity scale.

    Returns:
        4x4 transform (numpy, float64) mapping src into dst's frame.
    """
    src = np.asarray(src, dtype=np.float64)
    dst = np.asarray(dst, dtype=np.float64)
    mu_src = src.mean(axis=0)
    mu_dst = dst.mean(axis=0)
    src_c = src - mu_src
    dst_c = dst - mu_dst
    cov = dst_c.T @ src_c / len(src)
    u, d, vt = np.linalg.svd(cov)
    s = np.eye(3)
    if np.linalg.det(u) * np.linalg.det(vt) < 0:
        s[2, 2] = -1.0
    rot = u @ s @ vt
    if with_scale:
        var_src = (src_c**2).sum() / len(src)
        scale = np.trace(np.diag(d) @ s) / var_src
    else:
        scale = 1.0
    t = mu_dst - scale * rot @ mu_src
    out = np.eye(4)
    out[:3, :3] = scale * rot
    out[:3, 3] = t
    return out
