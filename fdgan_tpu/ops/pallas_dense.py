"""Pallas TPU kernel: fused DenseNet layer.

The FDGAN encoder's hot path is the densenet dense layer
(norm1→relu→1×1 conv→norm2→relu→3×3 conv, models/dehaze1113.py via
torchvision denseblocks; our XLA path: models/densenet.py). Profiling on
v5e shows the XLA lowering reaches only ~15 TFLOP/s / ~270 GB/s — the
128-channel intermediate `h` round-trips HBM three times (write, stats read,
conv2 read) and the BN epilogues force extra passes.

This kernel computes the whole layer in one VMEM-resident pass per row tile:

    t  = relu(a1 ⊙ x + b1)          # folded norm1 (per-channel affine)
    h  = t @ W1                      # 1×1 conv as MXU matmul, fp32 accum
    g  = relu(a2 ⊙ h + b2)          # folded norm2
    f  = Σ_{dy,dx} shift(g) @ W2[dy,dx]   # 3×3 conv as 9 shifted matmuls

`h`/`g` never touch HBM. The 3×3 halo rows are prepared XLA-side as a tiny
(B, n_tiles, 2, W, C) side array (zeros at image borders — torch zero-pad
semantics), so every Pallas block is disjoint and the standard pipeline
double-buffers the streams; no manual DMA needed.

BatchNorm modes:
* running stats — a/b folded from stored statistics; single pass.
* batch stats — per-channel data statistics. norm1's statistics equal the
  per-channel statistics of the growing concat (channels partition, so they
  are computed once per segment as it is produced). norm2's statistics are
  over `h`, produced by a phase-A kernel that computes only `t @ W1` and
  per-tile partial sums (h is linear in the data, but relu(bn1) changes per
  layer, so phase A must run per layer).

Training: `fused_dense_layer` and `h_batch_stats` carry a custom VJP whose
backward pass recomputes through a pure-XLA twin of the kernel (rematerialised
— nothing beyond the layer inputs is saved). On this platform Pallas is
bandwidth-capped below XLA (CLAUDE.md), so an XLA backward is the *faster*
choice, and the layer becomes trainable the moment the forward kernel wins.
Route the generator through it with `fdgan.apply(..., impl='pallas')`.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_EPS = 1e-5


# ---------------------------------------------------------------------------
# XLA-side helpers
# ---------------------------------------------------------------------------

def build_halo(x: jax.Array, tile_h: int) -> jax.Array:
    """(B, H, W, C) → (B, n_tiles, 2, W, C): rows t·TH−1 and t·TH+TH for each
    tile, zeros outside the image (3×3 zero-padding semantics)."""
    b, h, w, c = x.shape
    n = h // tile_h
    zero = jnp.zeros((b, 1, w, c), x.dtype)
    # top halo of tile t is image row t*TH - 1
    tops = jnp.concatenate([zero, x[:, tile_h - 1 : h - 1 : tile_h]], axis=1)[:, :n]
    # bottom halo of tile t is image row (t+1)*TH
    bots = jnp.concatenate([x[:, tile_h::tile_h], zero], axis=1)[:, :n]
    return jnp.stack([tops, bots], axis=2)  # (B, n, 2, W, C)


def fold_bn(scale, bias, mean, var, dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
    """BN as per-channel affine: y = a·x + b."""
    a = scale.astype(jnp.float32) * jax.lax.rsqrt(var.astype(jnp.float32) + _EPS)
    b = bias.astype(jnp.float32) - mean.astype(jnp.float32) * a
    return a.astype(dtype), b.astype(dtype)


def channel_stats(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Biased per-channel mean/var over (B, H, W) in fp32 — identical to the
    batch-mode statistics of nn.layers.batch_norm (dtype-split fused
    reductions; see nn.layers._batch_stats)."""
    from fdgan_tpu.nn.layers import _batch_stats

    return _batch_stats(x, axis=(0, 1, 2))


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _layer_kernel(
    x_ref,      # (1, TH, W, C)
    halo_ref,   # (1, 1, 2, W, C)
    a1_ref, b1_ref,   # (1, C) fp32
    w1_ref,           # (C, 128)
    a2_ref, b2_ref,   # (1, 128) fp32
    w2_ref,           # (9*128, 32)
    out_ref,    # (1, TH, W, F)
    *,
    tile_h: int,
    width: int,
    inter: int,
    out_ch: int,
):
    th, w = tile_h, width
    x = x_ref[0]                      # (TH, W, C)
    top = halo_ref[0, 0, 0]           # (W, C)
    bot = halo_ref[0, 0, 1]           # (W, C)
    xw = jnp.concatenate([top[None], x, bot[None]], axis=0)  # (TH+2, W, C)

    a1 = a1_ref[0]
    b1 = b1_ref[0]
    t = jnp.maximum(xw.astype(jnp.float32) * a1 + b1, 0.0).astype(w1_ref.dtype)

    h = jnp.dot(
        t.reshape((th + 2) * w, -1), w1_ref[:], preferred_element_type=jnp.float32
    )  # ((TH+2)W, 128)
    a2 = a2_ref[0]
    b2 = b2_ref[0]
    g = jnp.maximum(h * a2 + b2, 0.0).astype(w2_ref.dtype).reshape(th + 2, w, inter)

    # conv2's zero padding lives in g-space: at image borders the halo row is
    # outside the image and its g must be exactly 0 (a zero x row would leak
    # relu(b1)/relu(b2) through the affine BNs)
    i_t = pl.program_id(1)
    row = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
    top_ok = (i_t > 0) | (row > 0)
    bot_ok = (i_t < pl.num_programs(1) - 1) | (row < th + 1)
    g = jnp.where(top_ok & bot_ok, g, jnp.zeros_like(g))

    # lateral zero pad (torch padding=1)
    gp = jnp.pad(g, ((0, 0), (1, 1), (0, 0)))

    acc = jnp.zeros((th * w, out_ch), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            seg = gp[dy : dy + th, dx : dx + w, :].reshape(th * w, inter)
            wseg = w2_ref[(dy * 3 + dx) * inter : (dy * 3 + dx + 1) * inter, :]
            acc = acc + jnp.dot(seg, wseg, preferred_element_type=jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype).reshape(th, w, out_ch)


def _phase_a_kernel(
    x_ref,            # (1, TH, W, C)
    a1_ref, b1_ref,   # (1, C)
    w1_ref,           # (C, 128)
    sum_ref,          # (1, 1, 8, 128) fp32 — 8 sublanes to satisfy TPU tiling
    sq_ref,           # (1, 1, 8, 128) fp32
    *,
    tile_h: int,
    width: int,
    inter: int,
):
    x = x_ref[0]
    a1 = a1_ref[0]
    b1 = b1_ref[0]
    t = jnp.maximum(x.astype(jnp.float32) * a1 + b1, 0.0).astype(w1_ref.dtype)
    h = jnp.dot(t.reshape(tile_h * width, -1), w1_ref[:], preferred_element_type=jnp.float32)
    sum_ref[0, 0] = jnp.broadcast_to(jnp.sum(h, axis=0)[None, :], (8, inter))
    sq_ref[0, 0] = jnp.broadcast_to(jnp.sum(h * h, axis=0)[None, :], (8, inter))


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------

def _pick_tile_h(h: int) -> int:
    for cand in (16, 8, 4, 2):
        if h % cand == 0 and h // cand >= 1:
            return cand
    return h


def _fused_layer_pallas(x, a1, b1, w1, a2, b2, w2, tile_h, interpret) -> jax.Array:
    """Pallas forward. x (B,H,W,C); w1 (1,1,C,I) or (C,I); w2 (3,3,I,F)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    w1m = w1.reshape(-1, w1.shape[-1]) if w1.ndim == 4 else w1
    inter = w1m.shape[-1]
    out_ch = w2.shape[-1]
    w2m = w2.reshape(9 * inter, out_ch) if w2.ndim == 4 else w2
    th = tile_h or _pick_tile_h(h)
    n = h // th

    halo = build_halo(x, th)
    kernel = functools.partial(
        _layer_kernel, tile_h=th, width=w, inter=inter, out_ch=out_ch
    )
    return pl.pallas_call(
        kernel,
        grid=(b, n),
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda i, t: (i, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, w, c), lambda i, t: (i, t, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, inter), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, inter), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, inter), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * inter, out_ch), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, out_ch), lambda i, t: (i, t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, out_ch), x.dtype),
        interpret=interpret,
    )(
        x,
        halo,
        a1.reshape(1, -1).astype(jnp.float32),
        b1.reshape(1, -1).astype(jnp.float32),
        w1m.astype(x.dtype),
        a2.reshape(1, -1).astype(jnp.float32),
        b2.reshape(1, -1).astype(jnp.float32),
        w2m.astype(x.dtype),
    )


# --- differentiable wrappers: Pallas forward, XLA-recompute backward ---

_DN = ("NHWC", "HWIO", "NHWC")


def _layer_reference(x, a1, b1, w1, a2, b2, w2) -> jax.Array:
    """Pure-XLA twin of `_layer_kernel` (same math and precision choices);
    drives the custom VJP backward pass."""
    w1m = w1.reshape(1, 1, -1, w1.shape[-1]) if w1.ndim != 4 else w1
    inter = w1m.shape[-1]
    w2m = w2.reshape(3, 3, inter, -1) if w2.ndim != 4 else w2
    a1f = a1.reshape(-1).astype(jnp.float32)
    b1f = b1.reshape(-1).astype(jnp.float32)
    a2f = a2.reshape(-1).astype(jnp.float32)
    b2f = b2.reshape(-1).astype(jnp.float32)
    t = jnp.maximum(x.astype(jnp.float32) * a1f + b1f, 0.0).astype(x.dtype)
    h = jax.lax.conv_general_dilated(
        t, w1m.astype(x.dtype), (1, 1), "VALID", dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
    )
    g = jnp.maximum(h * a2f + b2f, 0.0).astype(x.dtype)
    f = jax.lax.conv_general_dilated(
        g, w2m.astype(x.dtype), (1, 1), ((1, 1), (1, 1)), dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
    )
    return f.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _fused_layer(x, a1, b1, w1, a2, b2, w2, tile_h, interpret):
    return _fused_layer_pallas(x, a1, b1, w1, a2, b2, w2, tile_h, interpret)


def _fused_layer_fwd(x, a1, b1, w1, a2, b2, w2, tile_h, interpret):
    out = _fused_layer_pallas(x, a1, b1, w1, a2, b2, w2, tile_h, interpret)
    return out, (x, a1, b1, w1, a2, b2, w2)


def _fused_layer_bwd(tile_h, interpret, res, ct):
    _, vjp = jax.vjp(_layer_reference, *res)
    return vjp(ct)


_fused_layer.defvjp(_fused_layer_fwd, _fused_layer_bwd)


def fused_dense_layer(
    x: jax.Array,
    a1: jax.Array,
    b1: jax.Array,
    w1: jax.Array,
    a2: jax.Array,
    b2: jax.Array,
    w2: jax.Array,
    tile_h: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """One fused dense layer (differentiable). x (B,H,W,C); w1 (1,1,C,I) or
    (C,I); w2 (3,3,I,F). Returns (B,H,W,F)."""
    return _fused_layer(x, a1, b1, w1, a2, b2, w2, tile_h, interpret)


def _h_stats_reference(x, a1, b1, w1) -> Tuple[jax.Array, jax.Array]:
    w1m = w1.reshape(1, 1, -1, w1.shape[-1]) if w1.ndim != 4 else w1
    a1f = a1.reshape(-1).astype(jnp.float32)
    b1f = b1.reshape(-1).astype(jnp.float32)
    t = jnp.maximum(x.astype(jnp.float32) * a1f + b1f, 0.0).astype(x.dtype)
    h = jax.lax.conv_general_dilated(
        t, w1m.astype(x.dtype), (1, 1), "VALID", dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
    )
    return channel_stats(h)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _h_stats(x, a1, b1, w1, tile_h, interpret):
    return _h_stats_pallas(x, a1, b1, w1, tile_h, interpret)


def _h_stats_fwd(x, a1, b1, w1, tile_h, interpret):
    return _h_stats_pallas(x, a1, b1, w1, tile_h, interpret), (x, a1, b1, w1)


def _h_stats_bwd(tile_h, interpret, res, ct):
    _, vjp = jax.vjp(_h_stats_reference, *res)
    return vjp(ct)


_h_stats.defvjp(_h_stats_fwd, _h_stats_bwd)


def h_batch_stats(
    x: jax.Array,
    a1: jax.Array,
    b1: jax.Array,
    w1: jax.Array,
    tile_h: int = 0,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Phase A (differentiable): per-channel (mean, biased var) of
    h = relu(a1·x+b1) @ W1."""
    return _h_stats(x, a1, b1, w1, tile_h, interpret)


def _h_stats_pallas(
    x: jax.Array,
    a1: jax.Array,
    b1: jax.Array,
    w1: jax.Array,
    tile_h: int = 0,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    w1m = w1.reshape(-1, w1.shape[-1]) if w1.ndim == 4 else w1
    inter = w1m.shape[-1]
    th = tile_h or _pick_tile_h(h)
    n = h // th

    kernel = functools.partial(_phase_a_kernel, tile_h=th, width=w, inter=inter)
    sums, sqs = pl.pallas_call(
        kernel,
        grid=(b, n),
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda i, t: (i, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, inter), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 8, inter), lambda i, t: (i, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, inter), lambda i, t: (i, t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, 8, inter), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 8, inter), jnp.float32),
        ],
        interpret=interpret,
    )(
        x,
        a1.reshape(1, -1).astype(jnp.float32),
        b1.reshape(1, -1).astype(jnp.float32),
        w1m.astype(x.dtype),
    )
    count = b * h * w
    mean = jnp.sum(sums[:, :, 0], axis=(0, 1)) / count
    var = jnp.sum(sqs[:, :, 0], axis=(0, 1)) / count - mean * mean
    return mean, jnp.maximum(var, 0.0)


# ---------------------------------------------------------------------------
# Full dense block
# ---------------------------------------------------------------------------

def dense_block_fused(
    params: dict,
    x: jax.Array,
    mode: str = "batch",
    interpret: bool = False,
    stats_out: Optional[dict] = None,
    prefix: str = "",
) -> jax.Array:
    """Drop-in replacement for models.densenet.dense_block_apply.

    In batch mode, norm1 statistics are the per-channel data statistics of
    the concat (computed once per segment — channels partition), and norm2
    statistics come from the phase-A kernel. When ``stats_out`` is given,
    every BN's (mean, unbiased var) pair is recorded under
    ``{prefix}denselayerN.normK`` — same contract as nn.layers.batch_norm —
    so a train step can fold them into running statistics.
    """
    n_layers = len(params)
    n_el = x.shape[0] * x.shape[1] * x.shape[2]
    corr = n_el / max(n_el - 1, 1)
    # per-channel data stats of the growing concat, built incrementally
    if mode == "batch":
        mean_cat, var_cat = channel_stats(x)
    for i in range(n_layers):
        lp = params[f"denselayer{i + 1}"]
        if mode == "batch":
            m1, v1 = mean_cat, var_cat
        else:
            m1, v1 = lp["norm1"]["mean"], lp["norm1"]["var"]
        a1, b1 = fold_bn(lp["norm1"]["scale"], lp["norm1"]["bias"], m1, v1)
        w1 = lp["conv1"]["kernel"]
        if mode == "batch":
            m2, v2 = h_batch_stats(x, a1, b1, w1, interpret=interpret)
        else:
            m2, v2 = lp["norm2"]["mean"], lp["norm2"]["var"]
        a2, b2 = fold_bn(lp["norm2"]["scale"], lp["norm2"]["bias"], m2, v2)
        if stats_out is not None and mode == "batch":
            stats_out[f"{prefix}denselayer{i + 1}.norm1"] = (m1, v1 * corr)
            stats_out[f"{prefix}denselayer{i + 1}.norm2"] = (m2, v2 * corr)
        f = fused_dense_layer(x, a1, b1, w1, a2, b2, lp["conv2"]["kernel"], interpret=interpret)
        if mode == "batch":
            mf, vf = channel_stats(f)
            mean_cat = jnp.concatenate([mean_cat, mf])
            var_cat = jnp.concatenate([var_cat, vf])
        x = jnp.concatenate([x, f], axis=-1)
    return x
