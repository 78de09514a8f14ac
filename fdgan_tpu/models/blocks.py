"""Building blocks of the FD-GAN / DCPDN model family.

Re-designed counterparts of the reference's block zoo in
``models/dehaze1113.py``:

* ``BottleneckBlock``/``1``/``2``  (:234-253, :299-318, :322-341) — BN+ReLU+
  1×1 → BN+ReLU+k×k (k=3/5/7), dense concat
* ``BottleneckBlockdy`` (:256-275) — same graph but the BN modules are *dead*
  (constructed, never called in forward); their parameters are still part of
  the checkpoint format, so they are kept in the param tree
* ``BottleneckBlockdy1`` (:278-297) — dy without the concat
* ``TransitionBlock`` family (:343-428) — (BN+)ReLU + 1×1 transposed conv +
  nearest ×2/×4 upsample / ×2 avg-pool / identity
* ``blockUNet`` / ``blockUNet1`` (:29-59), ``conv_block`` / ``deconv_block``
  (:14-26), ``BasicBlock_res`` (:65-94)

All NHWC; 1×1 "transposed" convs are plain 1×1 convs here (stride-1
ConvTranspose2d ≡ Conv2d with swapped in/out axes; the torch importer does
the weight-layout swap).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from fdgan_tpu.nn.layers import (
    CONV_DIMS,
    avg_pool,
    batch_norm,
    batch_norm_init,
    conv2d,
    conv2d_init,
    dropout,
    elu,
    leaky_relu,
    relu,
    upsample_nearest,
)


class BNCtx:
    """Threads BatchNorm mode + batch-stats capture through a model.

    ``mode='batch'`` (reference inference/training semantics) or 'running'.
    When ``collector`` is a dict, every BN records its batch statistics under
    its parameter path, letting the train step fold them into running stats.
    """

    def __init__(self, mode: str = "batch", collector: Optional[dict] = None, prefix: str = ""):
        self.mode = mode
        self.collector = collector
        self.prefix = prefix

    def sub(self, name: str) -> "BNCtx":
        return BNCtx(self.mode, self.collector, f"{self.prefix}{name}.")

    def __call__(self, params: dict, x: jax.Array, name: str) -> jax.Array:
        return batch_norm(
            params,
            x,
            mode=self.mode,
            stats_out=self.collector,
            stats_key=f"{self.prefix}{name}",
        )


DEFAULT_BN = BNCtx()


# ---------------------------------------------------------------------------
# Bottleneck (dense-layer) blocks
# ---------------------------------------------------------------------------

def bottleneck_init(rng, in_planes: int, out_planes: int, ksize: int = 3, dtype=jnp.float32) -> dict:
    """Shared init for all Bottleneck variants: params for bn1, conv1 (1×1,
    in→4·out), bn2, conv2 (k×k, 4·out→out); convs bias-free."""
    inter = out_planes * 4
    r1, r2 = jax.random.split(rng)
    return {
        "bn1": batch_norm_init(in_planes, dtype),
        "conv1": conv2d_init(r1, in_planes, inter, 1, bias=False, dtype=dtype),
        "bn2": batch_norm_init(inter, dtype),
        "conv2": conv2d_init(r2, inter, out_planes, ksize, bias=False, dtype=dtype),
    }


def bottleneck_apply(
    params: dict,
    x: jax.Array,
    ksize: int = 3,
    use_bn: bool = True,
    concat: bool = True,
    bn: BNCtx = DEFAULT_BN,
) -> jax.Array:
    """BottleneckBlock family forward. ``use_bn=False`` gives the *dy
    variants (dehaze1113.py:268-275: conv(relu(x)) without BN)."""
    pad = ksize // 2
    if use_bn:
        out = conv2d(params["conv1"], relu(bn(params["bn1"], x, "bn1")), padding=0)
        out = conv2d(params["conv2"], relu(bn(params["bn2"], out, "bn2")), padding=pad)
    else:
        out = conv2d(params["conv1"], relu(x), padding=0)
        out = conv2d(params["conv2"], relu(out), padding=pad)
    if concat:
        return jnp.concatenate([x, out], axis=-1)
    return out


# ---------------------------------------------------------------------------
# Transition blocks
# ---------------------------------------------------------------------------

def transition_init(rng, in_planes: int, out_planes: int, dtype=jnp.float32) -> dict:
    """bn1 + 1×1 (transposed) conv, bias-free (dehaze1113.py:343-355)."""
    return {
        "bn1": batch_norm_init(in_planes, dtype),
        "conv1": conv2d_init(rng, in_planes, out_planes, 1, bias=False, dtype=dtype),
    }


def transition_apply(
    params: dict,
    x: jax.Array,
    resize: str = "up2",
    use_bn: bool = True,
    bn: BNCtx = DEFAULT_BN,
) -> jax.Array:
    """Transition family forward. ``resize``: 'up2' | 'up4' | 'down2' | 'none'.
    ``use_bn=False`` gives TransitionBlockdy/dy1/dy2 (BN dead)."""
    h = relu(bn(params["bn1"], x, "bn1")) if use_bn else relu(x)
    out = conv2d(params["conv1"], h, padding=0)
    if resize == "up2":
        return upsample_nearest(out, 2)
    if resize == "up4":
        return upsample_nearest(out, 4)
    if resize == "down2":
        return avg_pool(out, 2)
    if resize == "none":
        return out
    raise ValueError(f"unknown resize {resize!r}")


# ---------------------------------------------------------------------------
# UNet-style blocks (discriminators / DCPDN G nets)
# ---------------------------------------------------------------------------

def block_unet_init(
    rng, in_c: int, out_c: int, kernel: int, bn_: bool = False, dtype=jnp.float32
) -> dict:
    p = {"conv": conv2d_init(rng, in_c, out_c, kernel, bias=False, dtype=dtype)}
    if bn_:
        p["bn"] = batch_norm_init(out_c, dtype)
    return p


def block_unet_apply(
    params: dict,
    x: jax.Array,
    kernel: int = 4,
    stride: int = 2,
    relu_: bool = True,
    transposed: bool = False,
    bn: BNCtx = DEFAULT_BN,
) -> jax.Array:
    """blockUNet (k=4, s=2) / blockUNet1 (k=3, s=1) forward: pre-activation
    (ReLU or LeakyReLU 0.2) → (transposed) conv → optional BN
    (dehaze1113.py:29-59)."""
    h = relu(x) if relu_ else leaky_relu(x, 0.2)
    if not transposed:
        y = conv2d(params["conv"], h, stride=stride, padding=1)
    else:
        y = conv_transpose2d(params["conv"], h, stride=stride, padding=1)
    if "bn" in params:
        y = bn(params["bn"], y, "bn")
    return y


def conv_transpose2d(params: dict, x: jax.Array, stride: int = 2, padding: int = 1) -> jax.Array:
    """Torch-semantics ConvTranspose2d. Kernel stored (kh, kw, in, out) like
    every other conv here (torch weight (in, out, kh, kw) → transpose
    (2,3,0,1) at import). Implemented as input-dilated conv with the spatially
    flipped kernel — the standard XLA lowering, MXU-friendly."""
    kernel = params["kernel"]
    kh, kw = kernel.shape[0], kernel.shape[1]
    # swap I/O: conv consumes (kh, kw, in, out) with in == x channels
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding=[(kh - 1 - padding, kh - 1 - padding), (kw - 1 - padding, kw - 1 - padding)],
        lhs_dilation=(stride, stride),
        dimension_numbers=CONV_DIMS,
    )
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    return y


# conv_block / deconv_block of the BEGAN-style D1 (dehaze1113.py:14-26)

def began_conv_block_init(rng, in_dim: int, out_dim: int, dtype=jnp.float32) -> dict:
    r = jax.random.split(rng, 3)
    return {
        "0": conv2d_init(r[0], in_dim, in_dim, 3, dtype=dtype),
        "2": conv2d_init(r[1], in_dim, in_dim, 3, dtype=dtype),
        "4": conv2d_init(r[2], in_dim, out_dim, 1, dtype=dtype),
    }


def began_conv_block_apply(params: dict, x: jax.Array) -> jax.Array:
    h = elu(conv2d(params["0"], x, padding=1))
    h = elu(conv2d(params["2"], h, padding=1))
    h = conv2d(params["4"], h, padding=0)
    return avg_pool(h, 2)


def began_deconv_block_init(rng, in_dim: int, out_dim: int, dtype=jnp.float32) -> dict:
    r = jax.random.split(rng, 2)
    return {
        "0": conv2d_init(r[0], in_dim, out_dim, 3, dtype=dtype),
        "2": conv2d_init(r[1], out_dim, out_dim, 3, dtype=dtype),
    }


def began_deconv_block_apply(params: dict, x: jax.Array) -> jax.Array:
    h = elu(conv2d(params["0"], x, padding=1))
    h = elu(conv2d(params["2"], h, padding=1))
    return upsample_nearest(h, 2)


# ResNet BasicBlock (dehaze1113.py:65-94) — present for completeness

def basic_block_res_init(rng, inplanes: int, planes: int, dtype=jnp.float32) -> dict:
    r1, r2 = jax.random.split(rng)
    return {
        "conv1": conv2d_init(r1, inplanes, planes, 3, bias=False, dtype=dtype),
        "bn1": batch_norm_init(planes, dtype),
        "conv2": conv2d_init(r2, planes, planes, 3, bias=False, dtype=dtype),
        "bn2": batch_norm_init(planes, dtype),
    }


def basic_block_res_apply(params: dict, x: jax.Array, bn: BNCtx = DEFAULT_BN) -> jax.Array:
    out = relu(bn(params["bn1"], conv2d(params["conv1"], x, padding=1), "bn1"))
    out = bn(params["bn2"], conv2d(params["conv2"], out, padding=1), "bn2")
    return relu(out + x)
