"""Discriminators of the FD-GAN family + the frequency-fusion wrapper.

* ``nlayer``  — PatchGAN ``NLayerDiscriminator`` (dehaze1113.py:142-186),
  pix2pix-style: 4×4 stride-2 conv ladder, ndf=64, n_layers=3, BatchNorm,
  LeakyReLU(0.2), sigmoid head. ``input_nc`` is free — with ``input_nc=9`` it
  is the natural fusion-discriminator body consuming concat[RGB, LF, HF].
* ``patch_d`` — the 70×70-style ``D`` (dehaze1113.py:188-230) built from
  blockUNet1 ladders ("sizePatchGAN=30").
* ``began_d`` — the BEGAN-style autoencoder ``D1`` (dehaze1113.py:96-140)
  that reconstructs its input through a 1×1 bottleneck.
* ``fusion_apply`` — frequency decomposition + PatchGAN in one jitted call.

Parameter trees mirror torch Sequential indices/names so checkpoints map
mechanically.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from fdgan_tpu.models.blocks import (
    BNCtx,
    began_conv_block_apply,
    began_conv_block_init,
    began_deconv_block_apply,
    began_deconv_block_init,
)
from fdgan_tpu.nn.layers import (
    batch_norm_init,
    conv2d,
    conv2d_init,
    elu,
    leaky_relu,
    sigmoid,
    tanh,
)
from fdgan_tpu.ops.filters import frequency_fuse


# ---------------------------------------------------------------------------
# NLayerDiscriminator (PatchGAN)
# ---------------------------------------------------------------------------

def nlayer_init(
    rng: jax.Array,
    input_nc: int = 9,
    ndf: int = 64,
    n_layers: int = 3,
    dtype=jnp.float32,
) -> dict:
    """Sequential-index param tree: model.{0,2,5,8,11} convs, {3,6,9} BNs
    for the default n_layers=3 (middle convs bias-free under BatchNorm,
    dehaze1113.py:146-148). The sigmoid head is activation-only (no
    params), so it's an ``nlayer_apply(use_sigmoid=...)`` switch — init
    deliberately has no such flag (it used to accept-and-ignore one)."""
    keys = iter(jax.random.split(rng, n_layers + 3))
    model = {}
    idx = 0
    model[str(idx)] = conv2d_init(next(keys), input_nc, ndf, 4, bias=True, dtype=dtype)
    idx += 2  # conv, lrelu
    nf_mult = 1
    for n in range(1, n_layers):
        nf_prev, nf_mult = nf_mult, min(2**n, 8)
        model[str(idx)] = conv2d_init(next(keys), ndf * nf_prev, ndf * nf_mult, 4, bias=False, dtype=dtype)
        model[str(idx + 1)] = batch_norm_init(ndf * nf_mult, dtype)
        idx += 3  # conv, bn, lrelu
    nf_prev, nf_mult = nf_mult, min(2**n_layers, 8)
    model[str(idx)] = conv2d_init(next(keys), ndf * nf_prev, ndf * nf_mult, 4, bias=False, dtype=dtype)
    model[str(idx + 1)] = batch_norm_init(ndf * nf_mult, dtype)
    idx += 3
    model[str(idx)] = conv2d_init(next(keys), ndf * nf_mult, 1, 4, bias=True, dtype=dtype)
    return {"model": model}


def nlayer_apply(
    params: dict,
    x: jax.Array,
    bn: Optional[BNCtx] = None,
    n_layers: int = 3,
    use_sigmoid: bool = True,
) -> jax.Array:
    """PatchGAN forward: NHWC image(s) → per-patch probability map.

    ``n_layers``/``use_sigmoid`` are static architecture switches and must
    match the values used at init (kept out of the param tree so it stays a
    pure array pytree under jit)."""
    bn = bn or BNCtx()
    model = params["model"]
    h = leaky_relu(conv2d(model["0"], x, stride=2, padding=1), 0.2)
    idx = 2
    for _ in range(1, n_layers):
        h = conv2d(model[str(idx)], h, stride=2, padding=1)
        h = leaky_relu(bn(model[str(idx + 1)], h, f"model.{idx + 1}"), 0.2)
        idx += 3
    h = conv2d(model[str(idx)], h, stride=1, padding=1)
    h = leaky_relu(bn(model[str(idx + 1)], h, f"model.{idx + 1}"), 0.2)
    idx += 3
    h = conv2d(model[str(idx)], h, stride=1, padding=1)
    if h.shape[1] == 0 or h.shape[2] == 0:
        raise ValueError(
            f"input too small for NLayerDiscriminator: patch map is {h.shape}; "
            f"the 4x4 tail convs need >=24px input (got {x.shape[1]}x{x.shape[2]})"
        )
    if use_sigmoid:
        # fp32 head: bf16 sigmoid saturates to exactly 0/1 at ~|logit|>8,
        # which defeats the BCE clip and NaNs adversarial training
        h = sigmoid(h.astype(jnp.float32))
    return h


def fusion_apply(
    params: dict, x: jax.Array, bn: Optional[BNCtx] = None, impl: str = "xla"
) -> jax.Array:
    """Fusion-discriminator: D(concat[RGB, GaussianBlur₁₅,σ₃(x), Laplacian₃(x)]).

    This is the FD-GAN 'fusion-discriminator with frequency priors': the
    9-channel decomposition (SURVEY.md §2.9) feeding the PatchGAN body.
    ``impl='pallas'`` uses the fused single-pass TPU kernel
    (ops/pallas_filters.py)."""
    if impl == "pallas":
        from fdgan_tpu.ops.pallas_filters import frequency_fuse_pallas

        fused = frequency_fuse_pallas(x)
    else:
        fused = frequency_fuse(x)
    return nlayer_apply(params, fused, bn)


# ---------------------------------------------------------------------------
# D — 70×70-style PatchGAN from blockUNet1 ladders (dehaze1113.py:188-230)
# ---------------------------------------------------------------------------

def patch_d_init(rng: jax.Array, nc: int = 3, nf: int = 64, dtype=jnp.float32) -> dict:
    """Tree nests under ``main`` like the reference's ``self.main``
    Sequential (dehaze1113.py:192-226 → state keys ``main.layer{i}.conv``
    after dotted-name dedup) so D checkpoints convert losslessly."""
    keys = iter(jax.random.split(rng, 5))
    return {"main": {
        "layer1": {"conv": conv2d_init(next(keys), nc, nf, 4, bias=False, dtype=dtype)},
        "layer2": {
            "conv": conv2d_init(next(keys), nf, nf * 2, 3, bias=False, dtype=dtype),
            "bn": batch_norm_init(nf * 2, dtype),
        },
        "layer3": {
            "conv": conv2d_init(next(keys), nf * 2, nf * 4, 3, bias=False, dtype=dtype),
            "bn": batch_norm_init(nf * 4, dtype),
        },
        "layer4": {"conv": conv2d_init(next(keys), nf * 4, nf * 8, 4, bias=False, dtype=dtype)},
        "layer5": {"conv": conv2d_init(next(keys), nf * 8, 1, 4, bias=False, dtype=dtype)},
    }}


def patch_d_apply(params: dict, x: jax.Array, bn: Optional[BNCtx] = None) -> jax.Array:
    bn = bn or BNCtx()
    params = params["main"]
    h = conv2d(params["layer1"]["conv"], x, stride=2, padding=1)
    # layer2/3: blockUNet1 (k=3, s=1) with BN, LeakyReLU pre-activation
    h = leaky_relu(h, 0.2)
    h = bn(params["layer2"]["bn"], conv2d(params["layer2"]["conv"], h, stride=1, padding=1), "main.layer2.bn")
    h = leaky_relu(h, 0.2)
    h = bn(params["layer3"]["bn"], conv2d(params["layer3"]["conv"], h, stride=1, padding=1), "main.layer3.bn")
    # layer4: LeakyReLU + 4×4 s1 conv (no BN)
    h = leaky_relu(h, 0.2)
    h = conv2d(params["layer4"]["conv"], h, stride=1, padding=1)
    # layer5: LeakyReLU + 4×4 s1 conv → sigmoid (fp32 — see nlayer_apply)
    h = leaky_relu(h, 0.2)
    h = conv2d(params["layer5"]["conv"], h, stride=1, padding=1)
    return sigmoid(h.astype(jnp.float32))


# ---------------------------------------------------------------------------
# D1 — BEGAN-style autoencoder discriminator (dehaze1113.py:96-140)
# ---------------------------------------------------------------------------

def began_d_init(
    rng: jax.Array, nc: int = 3, ndf: int = 64, hidden_size: int = 64, dtype=jnp.float32
) -> dict:
    keys = iter(jax.random.split(rng, 12))
    return {
        "conv1": {"0": conv2d_init(next(keys), nc, ndf, 3, dtype=dtype)},
        "conv2": began_conv_block_init(next(keys), ndf, ndf, dtype),
        "conv3": began_conv_block_init(next(keys), ndf, ndf * 2, dtype),
        "conv4": began_conv_block_init(next(keys), ndf * 2, ndf * 3, dtype),
        "encode": conv2d_init(next(keys), ndf * 3, hidden_size, 1, dtype=dtype),
        "decode": conv2d_init(next(keys), hidden_size, ndf, 1, dtype=dtype),
        "deconv4": began_deconv_block_init(next(keys), ndf, ndf, dtype),
        "deconv3": began_deconv_block_init(next(keys), ndf, ndf, dtype),
        "deconv2": began_deconv_block_init(next(keys), ndf, ndf, dtype),
        "deconv1": {
            "0": conv2d_init(next(keys), ndf, ndf, 3, dtype=dtype),
            "2": conv2d_init(next(keys), ndf, ndf, 3, dtype=dtype),
            "4": conv2d_init(next(keys), ndf, nc, 3, dtype=dtype),
        },
    }


def began_d_apply(params: dict, x: jax.Array) -> jax.Array:
    h = elu(conv2d(params["conv1"]["0"], x, padding=1))
    h = began_conv_block_apply(params["conv2"], h)
    h = began_conv_block_apply(params["conv3"], h)
    h = began_conv_block_apply(params["conv4"], h)
    h = conv2d(params["encode"], h, padding=0)
    h = conv2d(params["decode"], h, padding=0)
    h = began_deconv_block_apply(params["deconv4"], h)
    h = began_deconv_block_apply(params["deconv3"], h)
    h = began_deconv_block_apply(params["deconv2"], h)
    h = elu(conv2d(params["deconv1"]["0"], h, padding=1))
    h = elu(conv2d(params["deconv1"]["2"], h, padding=1))
    return tanh(conv2d(params["deconv1"]["4"], h, padding=1))
