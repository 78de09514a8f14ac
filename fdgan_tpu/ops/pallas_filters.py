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


def _slab(v: jax.Array, h: int, tile_h: int, halo: int) -> jax.Array:
    """(P, h+2*halo, W) → (P*n, tile_h+2*halo, W) overlapping H-slabs.

    Pallas block origins are multiples of the block shape, so overlapping
    halo reads cannot be expressed in an index_map; the slabs are gathered
    on the XLA side instead (extra copy ≈ halo/tile_h of the input)."""
    n = -(-h // tile_h)
    pad = n * tile_h - h
    if pad:
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    slabs = jnp.stack(
        [
            jax.lax.dynamic_slice_in_dim(v, t * tile_h, tile_h + 2 * halo, axis=1)
            for t in range(n)
        ],
        axis=1,
    )
    return slabs.reshape(v.shape[0] * n, tile_h + 2 * halo, v.shape[2])


def _plane_filters(
    xpadn: jax.Array, xz: jax.Array, interpret: bool, tile_h: int = 0
):
    """(P, H+14, W+14) normalised-reflect planes + (P, H+2, W+2) zero-pad raw
    planes → (blur, laplace) each (P, H, W). One grid step per plane (whole
    plane VMEM-resident, fine up to ~1024²); ``tile_h`` > 0 splits each
    plane into H-slabs so arbitrary heights (NTIRE 1600²+) fit VMEM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    planes, hp, wp = xpadn.shape
    h = hp - 2 * _P
    w = wp - 2 * _P

    if tile_h and tile_h < h:
        n = -(-h // tile_h)
        xpadn_s = _slab(xpadn, h, tile_h, _P)
        xz_s = _slab(xz, h, tile_h, 1)
        blur_s, lap_s = _plane_filters(xpadn_s, xz_s, interpret)
        blur = blur_s.reshape(planes, n * tile_h, w)[:, :h]
        lap = lap_s.reshape(planes, n * tile_h, w)[:, :h]
        return blur, lap

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


def frequency_fuse_pallas(
    x: jax.Array, interpret: bool = False, tile_h: int = 0
) -> jax.Array:
    """Fused concat[RGB, LF, HF] (NHWC, 9 channels out) via the Pallas kernel.

    Planes are VMEM-resident; above the on-chip-validated 512² whole-plane
    area they are automatically split into overlapping H-slabs whose height
    is fitted to the plane width (e.g. 64 rows at 1600 wide) so NTIRE-scale
    (1600²+) inputs fit the scoped-VMEM limit. Pass ``tile_h`` explicitly
    to override the fitted value.
    """
    b, h, w, c = x.shape
    if tile_h == 0 and h * w > 512 * 512:
        # VMEM budget, fitted from measured scoped-vmem OOMs (whole-plane
        # 1024² → 62.7 MB, slabs @1600 wide: 512 rows → 58.3 MB, 256 rows →
        # 32.5 MB, against the 16 MB scoped limit; whole-plane 512² ≈
        # 15.5 MB is the largest validated-on-chip resident plane):
        # rows ≈ 110k/(w+14), rounded down to a power of two — 64 rows is
        # safe up to ~4k-wide planes.
        import math

        tile_h = max(32, 2 ** int(math.log2(max(2.0, 110_000 / (w + 14)))))
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

    blur_p, lap_p = _plane_filters(xpadn, xz, interpret, tile_h=tile_h)

    def from_planes(v):
        return v.reshape(b, c, h, w).transpose(0, 2, 3, 1)

    return jnp.concatenate([x, from_planes(blur_p), from_planes(lap_p)], axis=-1)
