"""Pallas TPU kernel: fused frequency decomposition for the fusion-D input.

Computes the Gaussian-blur low-frequency branch (15×15 σ=3, separable,
reflect-pad, ImageNet-normalised input) and the Laplacian high-frequency
branch (3×3 centre −8, zero-pad) in ONE pass over VMEM-resident tiles —
instead of XLA's chain of pad / col-conv / row-conv / laplace-conv each
round-tripping HBM.

Layout: channels are folded into the grid ("plane" = one image channel),
putting W on the lane axis where it belongs for spatial filters; the NHWC↔
plane transposes are cheap relative to the filter passes they replace.

Semantics are bit-identical (up to fp reassociation) to
`fdgan_tpu.ops.filters.blur/laplace`, verified in tests/test_pallas_filters.py
against the XLA path in interpreter mode.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from fdgan_tpu.ops.filters import IMAGENET_MEAN, IMAGENET_STD, gaussian_1d

_L = 15
_P = _L // 2  # 7


def _taps() -> np.ndarray:
    t = gaussian_1d(_L, 3.0)
    return (t / t.sum()).astype(np.float32)


def _freq_kernel(xpadn_ref, xz_ref, blur_ref, lap_ref, *, tile_h: int, width: int):
    """One plane program: separable blur + laplacian, all in VMEM."""
    taps = _taps()
    a = xpadn_ref[0]  # (tile_h + 14, width + 14)
    # column pass (along H): 15 shifted-row accumulations
    tmp = taps[0] * a[0:tile_h, :]
    for k in range(1, _L):
        tmp = tmp + taps[k] * a[k : k + tile_h, :]
    # row pass (along W)
    blur = taps[0] * tmp[:, 0:width]
    for k in range(1, _L):
        blur = blur + taps[k] * tmp[:, k : k + width]
    blur_ref[0] = blur

    z = xz_ref[0]  # (tile_h + 2, width + 2)
    s = z[0:tile_h, 0:width]
    for di in range(3):
        for dj in range(3):
            if di == 0 and dj == 0:
                continue
            s = s + z[di : di + tile_h, dj : dj + width]
    lap_ref[0] = s - 9.0 * z[1 : 1 + tile_h, 1 : 1 + width]


def _plane_filters(xpadn: jax.Array, xz: jax.Array, interpret: bool):
    """(P, H+14, W+14) normalised-reflect planes + (P, H+2, W+2) zero-pad raw
    planes → (blur, laplace) each (P, H, W). One grid step per plane; the
    whole plane lives in VMEM (fits comfortably up to ~1024²)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    planes, hp, wp = xpadn.shape
    h = hp - 2 * _P
    w = wp - 2 * _P

    kernel = functools.partial(_freq_kernel, tile_h=h, width=w)
    blur, lap = pl.pallas_call(
        kernel,
        grid=(planes,),
        in_specs=[
            pl.BlockSpec((1, hp, wp), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h + 2, w + 2), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h, w), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((planes, h, w), xpadn.dtype),
            jax.ShapeDtypeStruct((planes, h, w), xpadn.dtype),
        ],
        interpret=interpret,
    )(xpadn, xz)
    return blur, lap


def frequency_fuse_pallas(x: jax.Array, interpret: bool = False) -> jax.Array:
    """Fused concat[RGB, LF, HF] (NHWC, 9 channels out) via the Pallas kernel.

    Whole-plane VMEM residency: suitable up to ~1024² inputs (beyond that,
    use the XLA path or spatial tiling at a higher level).
    """
    b, h, w, c = x.shape
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    xn = (x - mean) / std

    # NHWC → planes (B*C, H, W)
    def to_planes(v):
        return v.transpose(0, 3, 1, 2).reshape(b * c, h, w)

    xn_p = to_planes(xn)
    x_p = to_planes(x)
    xpadn = jnp.pad(xn_p, ((0, 0), (_P, _P), (_P, _P)), mode="reflect")
    xz = jnp.pad(x_p, ((0, 0), (1, 1), (1, 1)))

    blur_p, lap_p = _plane_filters(xpadn, xz, interpret)

    def from_planes(v):
        return v.reshape(b, c, h, w).transpose(0, 2, 3, 1)

    return jnp.concatenate([x, from_planes(blur_p), from_planes(lap_p)], axis=-1)
