import math

import torch
import torch.nn.functional as F


def peak_signal_noise_ratio(pred, target, data_range=1.0):
    mse = ((pred - target) ** 2).mean()
    return 10.0 * torch.log10(data_range**2 / mse)


def _gaussian_kernel(size=11, sigma=1.5, device=None, dtype=None):
    coords = torch.arange(size, device=device, dtype=dtype) - (size - 1) / 2.0
    g = torch.exp(-(coords**2) / (2 * sigma**2))
    g = g / g.sum()
    return g.outer(g)


def structural_similarity_index_measure(pred, target, data_range=1.0):
    """SSIM with torchmetrics defaults: gaussian kernel 11, sigma 1.5,
    k1=0.01, k2=0.03, mean reduction. Inputs (B, C, H, W)."""
    c = pred.shape[1]
    kern = _gaussian_kernel(device=pred.device, dtype=pred.dtype)
    kern = kern.expand(c, 1, 11, 11)
    pad = 0  # torchmetrics default: valid padding

    def filt(x):
        return F.conv2d(x, kern, padding=pad, groups=c)

    mu_p = filt(pred)
    mu_t = filt(target)
    mu_pp = filt(pred * pred) - mu_p**2
    mu_tt = filt(target * target) - mu_t**2
    mu_pt = filt(pred * target) - mu_p * mu_t
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    ssim_map = ((2 * mu_p * mu_t + c1) * (2 * mu_pt + c2)) / (
        (mu_p**2 + mu_t**2 + c1) * (mu_pp + mu_tt + c2)
    )
    return ssim_map.mean()
