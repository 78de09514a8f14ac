"""Frequency-prior operators of the FD-GAN fusion-discriminator.

The reference ships these only as compiled bytecode (`__pycache__/
loss.cpython-36.pyc`); recovered semantics (SURVEY.md §2.9, pyc lines cited
below):

* ``isotropic_gaussian_kernel(l=15, sigma=3.0)`` — exp(-(x²+y²)/2σ²) on an
  ``arange(-l//2+1, l//2+1)`` meshgrid, sum-normalised            (pyc 153-162)
* ``Blur`` (low-frequency branch) — reflection pad l//2, optional ImageNet
  input normalisation, depthwise single-channel conv              (pyc 122-151)
* ``Laplacian`` (high-frequency branch) — k×k ones with centre 1-k²
  (3×3 → −8), zero pad (k−1)//2, depthwise conv                   (pyc 165-304)
* fused discriminator input = concat[RGB, LF, HF] (9 channels) feeding
  ``NLayerDiscriminator(input_nc=9)``  (models/dehaze1113.py:142-143)

TPU-native implementation notes: NHWC, depthwise convs expressed with
``feature_group_count=C`` so XLA lowers them to VPU-friendly fused loops; the
15×15 Gaussian is separable and is applied as two rank-1 passes (15+15 taps
instead of 225 — ~7.5× fewer FLOPs, numerically identical because the kernel
is an exact outer product of its 1-D factor).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from fdgan_tpu.nn.layers import CONV_DIMS

# ImageNet statistics used by the recovered Blur operator (pyc 131-137).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def gaussian_1d(l: int = 15, sigma: float = 3.0) -> np.ndarray:
    """Unnormalised 1-D factor of the isotropic Gaussian on the reference's
    grid ``arange(-l//2+1, l//2+1)`` (pyc 153-162; note Python parses this as
    ``(-l)//2 + 1`` — floor division of the negative — giving the symmetric
    grid −(l−1)/2 … (l−1)/2 for odd l)."""
    ax = np.arange((-l) // 2 + 1.0, l // 2 + 1.0)
    return np.exp(-(ax**2) / (2.0 * sigma**2))


def isotropic_gaussian_kernel(l: int = 15, sigma: float = 3.0) -> np.ndarray:
    """2-D sum-normalised Gaussian kernel, exactly the reference constant."""
    g = gaussian_1d(l, sigma)
    k = np.outer(g, g)
    return (k / k.sum()).astype(np.float32)


def laplacian_kernel_2d(kernel_size: int = 3) -> np.ndarray:
    """k×k ones with centre 1−k² (kornia-derived; pyc 165-241)."""
    if kernel_size % 2 == 0 or kernel_size < 1:
        raise ValueError("kernel_size must be a positive odd number")
    k = np.ones((kernel_size, kernel_size), np.float32)
    mid = kernel_size // 2
    k[mid, mid] = 1.0 - kernel_size**2
    return k


def _depthwise(x: jax.Array, kernel_2d: jax.Array, padding) -> jax.Array:
    """Depthwise conv of a single 2-D kernel over every channel (NHWC)."""
    c = x.shape[-1]
    kh, kw = kernel_2d.shape
    k = jnp.broadcast_to(kernel_2d.astype(x.dtype)[:, :, None, None], (kh, kw, 1, c))
    return lax.conv_general_dilated(
        x, k, (1, 1), padding, dimension_numbers=CONV_DIMS, feature_group_count=c
    )


def _depthwise_separable(x: jax.Array, g1d: jax.Array) -> jax.Array:
    """Two rank-1 depthwise passes for a separable (outer-product) kernel."""
    c = x.shape[-1]
    t = g1d.astype(x.dtype)
    kcol = jnp.broadcast_to(t[:, None, None, None], (t.shape[0], 1, 1, c))
    krow = jnp.broadcast_to(t[None, :, None, None], (1, t.shape[0], 1, c))
    y = lax.conv_general_dilated(
        x, kcol, (1, 1), [(0, 0), (0, 0)], dimension_numbers=CONV_DIMS, feature_group_count=c
    )
    return lax.conv_general_dilated(
        y, krow, (1, 1), [(0, 0), (0, 0)], dimension_numbers=CONV_DIMS, feature_group_count=c
    )


def blur(
    x: jax.Array,
    l: int = 15,
    sigma: float = 3.0,
    use_input_norm: bool = True,
) -> jax.Array:
    """Low-frequency branch: reference ``blur`` singleton (Blur(l=15, σ=3)).

    ``use_input_norm`` ImageNet-normalises first (the recovered default);
    input is then reflection-padded by l//2 and depthwise-Gaussian filtered.
    NHWC in/out.
    """
    if use_input_norm:
        mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(IMAGENET_STD, x.dtype)
        x = (x - mean) / std
    p = l // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    # normalise the 1-D factor so outer(t, t) equals the sum-normalised 2-D kernel
    t = gaussian_1d(l, sigma)
    t = t / t.sum()
    return _depthwise_separable(xp, jnp.asarray(t, x.dtype))


def laplace(x: jax.Array, kernel_size: int = 3) -> jax.Array:
    """High-frequency branch: reference ``laplace_filter`` singleton
    (Laplacian(kernel_size=3), zero padding)."""
    p = (kernel_size - 1) // 2
    k = jnp.asarray(laplacian_kernel_2d(kernel_size))
    return _depthwise(x, k, [(p, p), (p, p)])


def frequency_fuse(x: jax.Array, use_input_norm: bool = True) -> jax.Array:
    """Fusion-discriminator input: concat[RGB, LF, HF] → 9 channels (NHWC).

    This is the frequency decomposition the FD-GAN paper's fusion
    discriminator consumes (SURVEY.md §2.9)."""
    return jnp.concatenate([x, blur(x, use_input_norm=use_input_norm), laplace(x)], axis=-1)
