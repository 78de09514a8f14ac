"""Colour-space conversions, pure-JAX and jittable on TPU.

The reference's ``models/pytorch_colors/__init__.py:15-91`` round-trips every
tensor through CPU NumPy + skimage and back to CUDA. Here the conversions are
native jnp on NHWC tensors (skimage conventions: RGB in [0,1], D65/2° white
point for Lab), so they fuse into the surrounding XLA graph instead of
forcing host transfers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import numpy as np

# ITU-R BT.601 (skimage yuv/ycbcr conventions); numpy at module scope so
# importing never touches a device backend
_RGB2YUV = np.array(
    [[0.299, 0.587, 0.114],
     [-0.14714119, -0.28886916, 0.43601035],
     [0.61497538, -0.51496512, -0.10001026]]
)
_RGB2XYZ = np.array(
    [[0.412453, 0.357580, 0.180423],
     [0.212671, 0.715160, 0.072169],
     [0.019334, 0.119193, 0.950227]]
)
# D65 reference white
_XYZ_REF_WHITE = np.array([0.95047, 1.0, 1.08883])


def _matmul_last(x: jax.Array, m: jax.Array) -> jax.Array:
    return jnp.einsum("...c,dc->...d", x, m.astype(x.dtype))


def rgb2yuv(x: jax.Array) -> jax.Array:
    return _matmul_last(x, _RGB2YUV)


def yuv2rgb(x: jax.Array) -> jax.Array:
    return _matmul_last(x, np.linalg.inv(_RGB2YUV))


def rgb2ycbcr(x: jax.Array) -> jax.Array:
    """skimage convention: Y in [16,235], Cb/Cr in [16,240] for [0,1] input."""
    y = 65.481 * x[..., 0] + 128.553 * x[..., 1] + 24.966 * x[..., 2] + 16.0
    cb = -37.797 * x[..., 0] - 74.203 * x[..., 1] + 112.0 * x[..., 2] + 128.0
    cr = 112.0 * x[..., 0] - 93.786 * x[..., 1] - 18.214 * x[..., 2] + 128.0
    return jnp.stack([y, cb, cr], axis=-1)


def ycbcr2rgb(x: jax.Array) -> jax.Array:
    y = x[..., 0] - 16.0
    cb = x[..., 1] - 128.0
    cr = x[..., 2] - 128.0
    r = 0.00456621 * y + 0.00625893 * cr
    g = 0.00456621 * y - 0.00153632 * cb - 0.00318811 * cr
    b = 0.00456621 * y + 0.00791071 * cb
    return jnp.stack([r, g, b], axis=-1)


def rgb2xyz(x: jax.Array) -> jax.Array:
    mask = x > 0.04045
    x = jnp.where(mask, ((x + 0.055) / 1.055) ** 2.4, x / 12.92)
    return _matmul_last(x, _RGB2XYZ)


def xyz2rgb(x: jax.Array) -> jax.Array:
    x = _matmul_last(x, np.linalg.inv(_RGB2XYZ))
    mask = x > 0.0031308
    x = jnp.where(mask, 1.055 * jnp.maximum(x, 1e-8) ** (1 / 2.4) - 0.055, 12.92 * x)
    return jnp.clip(x, 0.0, 1.0)


def rgb2lab(x: jax.Array) -> jax.Array:
    xyz = rgb2xyz(x) / _XYZ_REF_WHITE.astype(x.dtype)
    eps = 0.008856
    kappa = 7.787
    f = jnp.where(xyz > eps, jnp.maximum(xyz, 1e-8) ** (1.0 / 3.0), kappa * xyz + 16.0 / 116.0)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([L, a, b], axis=-1)


def lab2rgb(x: jax.Array) -> jax.Array:
    L, a, b = x[..., 0], x[..., 1], x[..., 2]
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    f = jnp.stack([fx, fy, fz], axis=-1)
    eps = 0.008856
    kappa = 7.787
    xyz = jnp.where(f**3 > eps, f**3, (f - 16.0 / 116.0) / kappa)
    return xyz2rgb(xyz * _XYZ_REF_WHITE.astype(x.dtype))


def rgb2hsv(x: jax.Array) -> jax.Array:
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    v = jnp.max(x, axis=-1)
    mn = jnp.min(x, axis=-1)
    delta = v - mn
    safe = jnp.where(delta == 0, 1.0, delta)
    h = jnp.where(
        v == r, (g - b) / safe, jnp.where(v == g, 2.0 + (b - r) / safe, 4.0 + (r - g) / safe)
    )
    h = (h / 6.0) % 1.0
    h = jnp.where(delta == 0, 0.0, h)
    s = jnp.where(v == 0, 0.0, delta / jnp.where(v == 0, 1.0, v))
    return jnp.stack([h, s, v], axis=-1)


def hsv2rgb(x: jax.Array) -> jax.Array:
    h, s, v = x[..., 0], x[..., 1], x[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.choose(i, [v, q, p, p, t, v], mode="clip")
    g = jnp.choose(i, [t, v, v, q, p, p], mode="clip")
    b = jnp.choose(i, [p, p, t, v, v, q], mode="clip")
    return jnp.stack([r, g, b], axis=-1)


# --- HED (Haematoxylin-Eosin-DAB stain deconvolution) ---
# Ruifrok & Johnston stain matrix, as in skimage.color.rgb_from_hed; the
# reference exposes rgb_to_hed/hed_to_rgb via pytorch_colors
# (models/pytorch_colors/__init__.py:71-72) as skimage CPU round-trips.
# We use the modern log-adjusted skimage semantics (clamp at 1e-6,
# normalise by log(1e-6)) which make separate/combine exact inverses.
_RGB_FROM_HED = np.array(
    [[0.65, 0.70, 0.29],
     [0.07, 0.99, 0.11],
     [0.27, 0.57, 0.78]]
)
_HED_FROM_RGB = np.linalg.inv(_RGB_FROM_HED)
_LOG_ADJUST = np.log(1e-6)


def rgb2hed(x: jax.Array) -> jax.Array:
    """RGB in [0,1] -> HED stain concentrations (non-negative)."""
    x = jnp.maximum(x, 1e-6)
    stains = jnp.einsum(
        "...c,cd->...d", jnp.log(x) / _LOG_ADJUST, _HED_FROM_RGB.astype(x.dtype)
    )
    return jnp.maximum(stains, 0.0)


def hed2rgb(x: jax.Array) -> jax.Array:
    """HED stain concentrations -> RGB in [0,1]."""
    log_rgb = jnp.einsum("...c,cd->...d", -(x * -_LOG_ADJUST), _RGB_FROM_HED.astype(x.dtype))
    return jnp.clip(jnp.exp(log_rgb), 0.0, 1.0)


_CONVERTERS = {
    ("rgb", "yuv"): rgb2yuv,
    ("yuv", "rgb"): yuv2rgb,
    ("rgb", "ycbcr"): rgb2ycbcr,
    ("ycbcr", "rgb"): ycbcr2rgb,
    ("rgb", "xyz"): rgb2xyz,
    ("xyz", "rgb"): xyz2rgb,
    ("rgb", "lab"): rgb2lab,
    ("lab", "rgb"): lab2rgb,
    ("rgb", "hsv"): rgb2hsv,
    ("hsv", "rgb"): hsv2rgb,
    ("rgb", "hed"): rgb2hed,
    ("hed", "rgb"): hed2rgb,
}


def convert(x: jax.Array, src: str, dst: str) -> jax.Array:
    """Dispatcher mirroring pytorch_colors ``convert()`` (pytorch_colors/
    __init__.py:83-91), without the CPU round-trip."""
    if src == dst:
        return x
    key = (src.lower(), dst.lower())
    if key in _CONVERTERS:
        return _CONVERTERS[key](x)
    if (src, "rgb") in _CONVERTERS and ("rgb", dst) in _CONVERTERS:
        return _CONVERTERS[("rgb", dst)](_CONVERTERS[(src, "rgb")](x))
    raise ValueError(f"no converter {src} -> {dst}")
