"""Functional NN layers, TPU-native layout.

Conventions (deliberately different from the reference's torch NCHW/OIHW —
this is the XLA-friendly layout on TPU):

* activations: NHWC
* conv kernels: HWIO
* parameters: plain nested dicts of jnp arrays

A "conv" param dict is ``{"kernel": (kh, kw, in, out)[, "bias": (out,)]}``.
A "bn" param dict is ``{"scale": (c,), "bias": (c,), "mean": (c,), "var": (c,)}``
— running statistics live next to the affine parameters so reference torch
checkpoints (which carry running stats) convert losslessly.

BatchNorm semantics follow the reference quirk (README.md:38 of the
reference): inference uses *batch* statistics ("train mode"), because that is
the published way to run the FD-GAN checkpoints. ``mode='running'`` gives the
conventional eval behaviour.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

# NHWC activations, HWIO kernels — the native TPU conv layout.
CONV_DIMS = ("NHWC", "HWIO", "NHWC")


def _as_pair(v: Union[int, Tuple[int, int]]) -> Tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    return tuple(v)  # type: ignore[return-value]


# ---------------------------------------------------------------------------
# Convolution
# ---------------------------------------------------------------------------

def conv2d_init(
    rng: jax.Array,
    in_ch: int,
    out_ch: int,
    kernel: Union[int, Tuple[int, int]] = 3,
    bias: bool = True,
    init: str = "torch",
    dtype=jnp.float32,
) -> dict:
    """Initialise a conv parameter dict.

    ``init='torch'`` replicates torch's default kaiming-uniform(a=sqrt(5))
    so randomly-initialised models match the reference's statistics;
    ``init='dcgan'`` is N(0, 0.02) as in the reference's ``misc.weights_init``
    (misc.py:16-22).
    """
    kh, kw = _as_pair(kernel)
    k_rng, b_rng = jax.random.split(rng)
    fan_in = in_ch * kh * kw
    shape = (kh, kw, in_ch, out_ch)
    if init == "dcgan":
        kernel_arr = 0.02 * jax.random.normal(k_rng, shape, dtype)
    elif init == "torch":
        # kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)) * sqrt(3)*gain
        gain = math.sqrt(2.0 / (1 + 5.0))
        bound = gain * math.sqrt(3.0 / fan_in)
        kernel_arr = jax.random.uniform(k_rng, shape, dtype, -bound, bound)
    elif init == "he":
        std = math.sqrt(2.0 / fan_in)
        kernel_arr = std * jax.random.normal(k_rng, shape, dtype)
    else:
        raise ValueError(f"unknown init {init!r}")
    params = {"kernel": kernel_arr}
    if bias:
        bound = 1.0 / math.sqrt(fan_in)
        params["bias"] = jax.random.uniform(b_rng, (out_ch,), dtype, -bound, bound)
    return params


def conv2d(
    params: dict,
    x: jax.Array,
    stride: Union[int, Tuple[int, int]] = 1,
    padding: Union[str, int, Sequence[Tuple[int, int]]] = 0,
    feature_group_count: int = 1,
) -> jax.Array:
    """NHWC conv. ``padding`` is symmetric int (torch-style), 'SAME'/'VALID',
    or explicit [(lo, hi), (lo, hi)]."""
    kernel = params["kernel"]
    if isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    elif isinstance(padding, str):
        pad = padding
    else:
        pad = list(padding)
    y = lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=_as_pair(stride),
        padding=pad,
        dimension_numbers=CONV_DIMS,
        feature_group_count=feature_group_count,
    )
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# BatchNorm
# ---------------------------------------------------------------------------

def batch_norm_init(c: int, dtype=jnp.float32) -> dict:
    return {
        "scale": jnp.ones((c,), dtype),
        "bias": jnp.zeros((c,), dtype),
        "mean": jnp.zeros((c,), dtype),
        "var": jnp.ones((c,), dtype),
    }


def _batch_stats(x: jax.Array, axis) -> tuple:
    """fp32 per-channel (mean, biased var) with no fp32 materialisation of x.

    Each reduction consumes its OWN fused elementwise chain — a shared
    ``x.astype(f32)`` operand would materialise the full fp32 tensor (2 GB
    @1024² batch 4, the dominant HBM allocation at high resolution).

    bf16 activations use the one-pass E[x²]−μ² form: it saves a whole pass
    over x (+10 % end-to-end at 512², PERFORMANCE.md) and its fp32
    cancellation term is far below bf16 input quantisation noise. fp32
    activations (checkpoint-parity mode) use the cancellation-free two-pass
    form — one-pass measurably costs torch-oracle parity there.
    """
    mean = jnp.mean(x, axis=axis, dtype=jnp.float32)
    if x.dtype == jnp.bfloat16:
        mean_sq = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=axis)
        var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    else:
        var = jnp.mean(jnp.square(x.astype(jnp.float32) - mean), axis=axis)
    return mean, var


def batch_norm(
    params: dict,
    x: jax.Array,
    mode: str = "batch",
    eps: float = 1e-5,
    stats_out: Optional[dict] = None,
    stats_key: Optional[str] = None,
) -> jax.Array:
    """BatchNorm over NHWC (normalise over N, H, W).

    ``mode='batch'`` uses the current batch's statistics — the reference's
    published inference mode (its README instructs `netG.train()`).
    ``mode='running'`` uses the stored running statistics.

    When ``stats_out`` (a plain dict collector) and ``stats_key`` are given in
    batch mode, the computed (mean, var_unbiased) pair is recorded so a train
    step can fold it into the running statistics torch-style.
    """
    if mode == "batch":
        mean, var = _batch_stats(x, axis=(0, 1, 2))
        if stats_out is not None and stats_key is not None:
            n = x.shape[0] * x.shape[1] * x.shape[2]
            correction = n / max(n - 1, 1)
            stats_out[stats_key] = (mean, var * correction)
    elif mode == "running":
        mean = params["mean"].astype(jnp.float32)
        var = params["var"].astype(jnp.float32)
    else:
        raise ValueError(f"unknown BN mode {mode!r}")
    scale = params["scale"].astype(jnp.float32)
    bias = params["bias"].astype(jnp.float32)
    inv = scale * lax.rsqrt(var + eps)
    # single fused multiply-add in the activation dtype
    return (x * inv.astype(x.dtype)) + (bias - mean * inv).astype(x.dtype)


def update_running_stats(params: dict, mean: jax.Array, var: jax.Array, momentum: float = 0.1) -> dict:
    """Torch-style running-stat update: r = (1-m)*r + m*batch."""
    out = dict(params)
    out["mean"] = (1 - momentum) * params["mean"] + momentum * mean.astype(params["mean"].dtype)
    out["var"] = (1 - momentum) * params["var"] + momentum * var.astype(params["var"].dtype)
    return out


# ---------------------------------------------------------------------------
# Pooling / resizing
# ---------------------------------------------------------------------------

def avg_pool(x: jax.Array, window: int, stride: Optional[int] = None) -> jax.Array:
    """Torch-style avg_pool2d: floor division on odd sizes, no padding."""
    stride = stride or window
    # NB: literal 0. init — lax.reduce_window's autodiff rule pattern-matches
    # the (add, 0) monoid; an array-valued init breaks reverse-mode
    y = lax.reduce_window(
        x,
        0.0 if jnp.issubdtype(x.dtype, jnp.floating) else 0,
        lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )
    return y / jnp.asarray(window * window, x.dtype)


def max_pool(x: jax.Array, window: int, stride: Optional[int] = None, padding: int = 0) -> jax.Array:
    stride = stride or window
    pad = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=pad,
    )


def upsample_nearest(x: jax.Array, scale: int = 2) -> jax.Array:
    """Nearest-neighbour ×scale upsample (reference: F.upsample_nearest)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, scale, w, scale, c))
    return x.reshape(b, h * scale, w * scale, c)


def upsample_nearest_to(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Nearest upsample to an exact (H, W) — used by the DCPDN pyramid heads."""
    b, h, w, c = x.shape
    out_h, out_w = size
    rows = (jnp.arange(out_h) * h) // out_h
    cols = (jnp.arange(out_w) * w) // out_w
    return x[:, rows][:, :, cols]


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------

def relu(x):
    return jnp.maximum(x, 0)


def leaky_relu(x, negative_slope: float = 0.2):
    return jnp.where(x >= 0, x, negative_slope * x)


def elu(x):
    return jnp.where(x > 0, x, jnp.expm1(jnp.minimum(x, 0)))


def sigmoid(x):
    return jax.nn.sigmoid(x)


def tanh(x):
    return jnp.tanh(x)


def dropout(rng: Optional[jax.Array], x: jax.Array, rate: float, train: bool) -> jax.Array:
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
