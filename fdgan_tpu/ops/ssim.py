"""Differentiable SSIM, parity with the reference's ``models/pytorch_ssim``.

Reference semantics (models/pytorch_ssim/__init__.py:7-73): 11×11 Gaussian
window with σ=1.5, per-channel depthwise convs with padding window//2,
C1=0.01², C2=0.03², mean over the full map (``size_average=True``) or
per-image mean otherwise.

TPU-native: NHWC, the Gaussian window is separable → two rank-1 depthwise
passes per filtered quantity. The five filtered maps (μ1, μ2, E[x²], E[y²],
E[xy]) are computed from a single 5C-channel stacked depthwise conv so XLA
fuses the whole SSIM map into one kernel pipeline.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from fdgan_tpu.nn.layers import CONV_DIMS

SSIM_WINDOW_SIZE = 11


def gaussian_window_1d(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    """Reference `gaussian()` (pytorch_ssim/__init__.py:7-9): normalised
    exp(-(x - w//2)²/2σ²)."""
    g = np.array(
        [math.exp(-((x - window_size // 2) ** 2) / (2.0 * sigma**2)) for x in range(window_size)],
        np.float64,
    )
    return (g / g.sum()).astype(np.float32)


def _sep_depthwise(x: jax.Array, t: jax.Array, pad: int) -> jax.Array:
    c = x.shape[-1]
    n = t.shape[0]
    kcol = jnp.broadcast_to(t.astype(x.dtype)[:, None, None, None], (n, 1, 1, c))
    krow = jnp.broadcast_to(t.astype(x.dtype)[None, :, None, None], (1, n, 1, c))
    # HIGHEST precision: TPU convs default to bf16 passes even on fp32 data,
    # and the E[x²]−μ² cancellation then produces SSIM values far outside
    # [-1, 1] (observed −26) that wreck the adversarial training gradients
    y = lax.conv_general_dilated(
        x, kcol, (1, 1), [(pad, pad), (0, 0)], dimension_numbers=CONV_DIMS,
        feature_group_count=c, precision=lax.Precision.HIGHEST,
    )
    return lax.conv_general_dilated(
        y, krow, (1, 1), [(0, 0), (pad, pad)], dimension_numbers=CONV_DIMS,
        feature_group_count=c, precision=lax.Precision.HIGHEST,
    )


def ssim_map(img1: jax.Array, img2: jax.Array, window_size: int = SSIM_WINDOW_SIZE) -> jax.Array:
    """Per-pixel SSIM map (NHWC). Window normalisation matches the reference:
    the 2-D window is the outer product of the normalised 1-D Gaussian."""
    t = jnp.asarray(gaussian_window_1d(window_size))
    pad = window_size // 2
    # fp32 throughout (reference torch semantics): in bf16 the cancellation
    # in E[x²]−μ² produces variances negative enough to defeat C2, and the
    # division then NaNs adversarial training within tens of steps
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    # one stacked pass over [x, y, x², y², xy]
    stacked = jnp.concatenate([img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=-1)
    f = _sep_depthwise(stacked, t, pad)
    c = img1.shape[-1]
    mu1, mu2, exx, eyy, exy = (f[..., i * c : (i + 1) * c] for i in range(5))
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = exx - mu1_sq
    sigma2_sq = eyy - mu2_sq
    sigma12 = exy - mu1_mu2
    c1 = 0.01**2
    c2 = 0.03**2
    return ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )


def ssim(
    img1: jax.Array,
    img2: jax.Array,
    window_size: int = SSIM_WINDOW_SIZE,
    size_average: bool = True,
) -> jax.Array:
    """Differentiable SSIM (reference `ssim()`, pytorch_ssim/__init__.py:65-73)."""
    m = ssim_map(img1, img2, window_size)
    if size_average:
        return jnp.mean(m)
    return jnp.mean(m, axis=(1, 2, 3))
