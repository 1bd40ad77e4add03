"""Quaternion ops (wxyz convention, matching pytorch3d semantics)."""

import torch


def quaternion_invert(q: torch.Tensor) -> torch.Tensor:
    scale = torch.tensor([1.0, -1.0, -1.0, -1.0], device=q.device, dtype=q.dtype)
    return q * scale


def quaternion_raw_multiply(a: torch.Tensor, b: torch.Tensor) -> torch.Tensor:
    aw, ax, ay, az = a.unbind(-1)
    bw, bx, by, bz = b.unbind(-1)
    return torch.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        dim=-1,
    )


def quaternion_multiply(a: torch.Tensor, b: torch.Tensor) -> torch.Tensor:
    out = quaternion_raw_multiply(a, b)
    # pytorch3d standardizes to nonnegative real part
    return torch.where(out[..., :1] < 0, -out, out)


def quaternion_apply(q: torch.Tensor, point: torch.Tensor) -> torch.Tensor:
    real = torch.zeros_like(point[..., :1])
    point_q = torch.cat([real, point], dim=-1)
    out = quaternion_raw_multiply(
        quaternion_raw_multiply(q, point_q), quaternion_invert(q)
    )
    return out[..., 1:]


def quaternion_to_matrix(q: torch.Tensor) -> torch.Tensor:
    w, x, y, z = q.unbind(-1)
    two_s = 2.0 / (q * q).sum(-1)
    o = torch.stack(
        [
            1 - two_s * (y * y + z * z),
            two_s * (x * y - z * w),
            two_s * (x * z + y * w),
            two_s * (x * y + z * w),
            1 - two_s * (x * x + z * z),
            two_s * (y * z - x * w),
            two_s * (x * z - y * w),
            two_s * (y * z + x * w),
            1 - two_s * (x * x + y * y),
        ],
        dim=-1,
    )
    return o.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quaternion(m: torch.Tensor) -> torch.Tensor:
    """Rotation matrix (..., 3, 3) -> quaternion wxyz (..., 4).

    Shepperd's method via the largest of the four squared components.
    """
    batch = m.shape[:-2]
    m = m.reshape(-1, 3, 3)
    m00, m01, m02 = m[:, 0, 0], m[:, 0, 1], m[:, 0, 2]
    m10, m11, m12 = m[:, 1, 0], m[:, 1, 1], m[:, 1, 2]
    m20, m21, m22 = m[:, 2, 0], m[:, 2, 1], m[:, 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return torch.sqrt(torch.clamp(x, min=0.0))

    qw_abs = safe_sqrt(1 + tr)
    qx_abs = safe_sqrt(1 + m00 - m11 - m22)
    qy_abs = safe_sqrt(1 - m00 + m11 - m22)
    qz_abs = safe_sqrt(1 - m00 - m11 + m22)

    cand = torch.stack(
        [
            torch.stack([qw_abs**2, m21 - m12, m02 - m20, m10 - m01], -1),
            torch.stack([m21 - m12, qx_abs**2, m01 + m10, m02 + m20], -1),
            torch.stack([m02 - m20, m01 + m10, qy_abs**2, m12 + m21], -1),
            torch.stack([m10 - m01, m02 + m20, m12 + m21, qz_abs**2], -1),
        ],
        dim=1,
    )  # (N, 4, 4); row i is the quaternion scaled by 2*abs_i (up to sign)
    abs_vals = torch.stack([qw_abs, qx_abs, qy_abs, qz_abs], -1)  # (N, 4)
    best = abs_vals.argmax(dim=-1)
    q = cand[torch.arange(len(m)), best] / (
        2.0 * abs_vals[torch.arange(len(m)), best].clamp(min=1e-12).unsqueeze(-1)
    )
    q = torch.where(q[..., :1] < 0, -q, q)
    return q.reshape(batch + (4,))
