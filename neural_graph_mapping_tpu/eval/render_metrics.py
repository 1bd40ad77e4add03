"""Render-quality metrics: PSNR, SSIM, depth-L1, LPIPS.

Rebuild of the reference ``evaluation.py:15-62`` (torchmetrics functional +
LPIPS module). All metrics take (H, W, C) images in [0, 1] (RGB) / meters
(depth), support the reference's crop-by-N-pixels protocol
(config/newton_eval.yaml eval_crop), clamp predictions to [0, 1], and run in
jnp.

LPIPS requires pretrained CNN weights; in this zero-egress environment a
weights file can be supplied via ``NGM_LPIPS_WEIGHTS`` (a .npz of conv
kernels + linear head as produced by ``scripts/export_lpips.py`` from a
torchmetrics checkout). Without weights, :func:`lpips` raises — callers (the
eval loop) skip the metric and say so.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _crop(img: jnp.ndarray, crop: Optional[int]) -> jnp.ndarray:
    if crop:
        return img[crop:-crop, crop:-crop]
    return img


def psnr(
    rendered: jnp.ndarray, target: jnp.ndarray, crop: Optional[int] = None
) -> float:
    """Peak signal-to-noise ratio, data range 1 (evaluation.py:46-56)."""
    a = jnp.clip(_crop(rendered, crop), 0.0, 1.0)
    b = jnp.clip(_crop(target, crop), 0.0, 1.0)
    mse = jnp.mean((a - b) ** 2)
    return float(-10.0 * jnp.log10(jnp.maximum(mse, 1e-12)))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2.0 * sigma**2))
    return g / jnp.sum(g)


def _filter2d_separable(img: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Valid-mode separable 2D filtering of (H, W, C)."""
    size = k.shape[0]
    c = img.shape[-1]
    x = jnp.moveaxis(img, -1, 0)[:, None]  # (C, 1, H, W)
    kh = k.reshape(1, 1, size, 1)
    kw = k.reshape(1, 1, 1, size)
    x = jax.lax.conv_general_dilated(x, jnp.tile(kh, (1, 1, 1, 1)), (1, 1), "VALID")
    x = jax.lax.conv_general_dilated(x, jnp.tile(kw, (1, 1, 1, 1)), (1, 1), "VALID")
    return jnp.moveaxis(x[:, 0], 0, -1)


def ssim(
    rendered: jnp.ndarray,
    target: jnp.ndarray,
    crop: Optional[int] = None,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> float:
    """Structural similarity (gaussian kernel, data range 1) — the
    torchmetrics default the reference uses (evaluation.py:20-30)."""
    a = jnp.clip(_crop(rendered, crop), 0.0, 1.0)
    b = jnp.clip(_crop(target, crop), 0.0, 1.0)
    k = _gaussian_kernel(kernel_size, sigma)
    c1 = k1**2
    c2 = k2**2
    mu_a = _filter2d_separable(a, k)
    mu_b = _filter2d_separable(b, k)
    mu_aa = _filter2d_separable(a * a, k)
    mu_bb = _filter2d_separable(b * b, k)
    mu_ab = _filter2d_separable(a * b, k)
    var_a = mu_aa - mu_a**2
    var_b = mu_bb - mu_b**2
    cov = mu_ab - mu_a * mu_b
    score = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    )
    return float(jnp.mean(score))


def depthl1(
    rendered: jnp.ndarray, target: jnp.ndarray, crop: Optional[int] = None
) -> float:
    """Mean absolute depth error over pixels with target depth != 0
    (evaluation.py:59-62)."""
    a = _crop(rendered, crop)
    b = _crop(target, crop)
    mask = b != 0.0
    denom = jnp.maximum(jnp.sum(mask), 1)
    return float(jnp.sum(jnp.abs(a - b) * mask) / denom)


# ---------------------------------------------------------------------------
# LPIPS (AlexNet backbone, torchmetrics-compatible) with externally supplied
# weights (zero-egress environment: pretrained weights cannot be downloaded).
# ---------------------------------------------------------------------------

_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


@functools.lru_cache(maxsize=1)
def _lpips_weights():
    path = os.environ.get("NGM_LPIPS_WEIGHTS", "")
    if not path or not os.path.isfile(path):
        raise FileNotFoundError(
            "LPIPS weights not available (set NGM_LPIPS_WEIGHTS to an .npz "
            "exported by scripts/export_lpips.py)"
        )
    data = np.load(path)
    return {k: jnp.asarray(v) for k, v in data.items()}


def lpips(
    rendered: jnp.ndarray, target: jnp.ndarray, crop: Optional[int] = None
) -> float:
    """LPIPS perceptual distance, AlexNet variant (evaluation.py:15-17, 33-43).

    Images (H, W, 3) in [0, 1]; normalize=True semantics (inputs scaled to
    [-1, 1] then ImageNet-shifted, as torchmetrics does).
    """
    w = _lpips_weights()
    a = jnp.clip(_crop(rendered, crop), 0.0, 1.0)
    b = jnp.clip(_crop(target, crop), 0.0, 1.0)

    def net_feats(img):
        x = (2.0 * img - 1.0 - _LPIPS_SHIFT) / _LPIPS_SCALE
        x = jnp.moveaxis(x, -1, 0)[None]  # (1, 3, H, W)
        feats = []
        # (name, stride, pad, pool-after): torchvision AlexNet features —
        # note conv0 uses padding=2, NOT the 'same' padding of (11-1)//2
        conv_cfg = [
            ("conv0", 4, 2, 2), ("conv1", 1, 2, 2), ("conv2", 1, 1, 1),
            ("conv3", 1, 1, 1), ("conv4", 1, 1, 1),
        ]
        for i, (name, stride, pad, pool) in enumerate(conv_cfg):
            kernel = w[f"{name}_w"]
            bias = w[f"{name}_b"]
            x = jax.lax.conv_general_dilated(
                x, kernel, (stride, stride), [(pad, pad), (pad, pad)]
            ) + bias[None, :, None, None]
            x = jnp.maximum(x, 0.0)
            feats.append(x)
            if pool > 1 and i < len(conv_cfg) - 1:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, pool, pool), "VALID"
                )
        return feats

    fa = net_feats(a)
    fb = net_feats(b)
    total = 0.0
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        na = xa / (jnp.linalg.norm(xa, axis=1, keepdims=True) + 1e-10)
        nb = xb / (jnp.linalg.norm(xb, axis=1, keepdims=True) + 1e-10)
        diff = (na - nb) ** 2
        lin = w[f"lin{i}_w"]  # (1, C, 1, 1)
        total = total + jnp.mean(jnp.sum(diff * lin, axis=1))
    return float(total)
