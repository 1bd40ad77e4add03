"""torchmetrics shim: functional PSNR/SSIM + a CPU no-op LPIPS module."""

from . import functional, image  # noqa: F401
