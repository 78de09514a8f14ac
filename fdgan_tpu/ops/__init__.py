from fdgan_tpu.ops.filters import (
    isotropic_gaussian_kernel,
    laplacian_kernel_2d,
    blur,
    laplace,
    frequency_fuse,
)
from fdgan_tpu.ops.ssim import ssim, SSIM_WINDOW_SIZE
from fdgan_tpu.ops import colors, metrics

__all__ = [
    "isotropic_gaussian_kernel",
    "laplacian_kernel_2d",
    "blur",
    "laplace",
    "frequency_fuse",
    "ssim",
    "SSIM_WINDOW_SIZE",
    "colors",
    "metrics",
]
