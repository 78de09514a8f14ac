"""DenseNet-121 encoder pieces, torch-checkpoint-name compatible.

The FD-GAN generator borrows torchvision densenet121 feature blocks
(models/dehaze1113.py:707-728). This module provides functionally equivalent
NHWC implementations whose parameter trees mirror the torchvision naming
(``denselayerN.norm1/conv1/norm2/conv2``, transitions ``norm/conv``) so the
reference `.pth` checkpoints convert mechanically.

DenseNet-121 constants: growth 32, bn_size 4, init features 64,
block config (6, 12, 24, 16).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fdgan_tpu.models.blocks import BNCtx, DEFAULT_BN
from fdgan_tpu.nn.layers import avg_pool, batch_norm_init, conv2d, conv2d_init, relu

GROWTH_RATE = 32
BN_SIZE = 4
BLOCK_CONFIG = (6, 12, 24, 16)
INIT_FEATURES = 64


def dense_layer_init(rng, in_ch: int, growth: int = GROWTH_RATE, dtype=jnp.float32) -> dict:
    inter = BN_SIZE * growth
    r1, r2 = jax.random.split(rng)
    return {
        "norm1": batch_norm_init(in_ch, dtype),
        "conv1": conv2d_init(r1, in_ch, inter, 1, bias=False, dtype=dtype),
        "norm2": batch_norm_init(inter, dtype),
        "conv2": conv2d_init(r2, inter, growth, 3, bias=False, dtype=dtype),
    }


def dense_layer_apply(params: dict, x: jax.Array, bn: BNCtx = DEFAULT_BN) -> jax.Array:
    h = conv2d(params["conv1"], relu(bn(params["norm1"], x, "norm1")), padding=0)
    h = conv2d(params["conv2"], relu(bn(params["norm2"], h, "norm2")), padding=1)
    return jnp.concatenate([x, h], axis=-1)


def dense_block_init(rng, in_ch: int, num_layers: int, dtype=jnp.float32) -> dict:
    params = {}
    for i in range(num_layers):
        params[f"denselayer{i + 1}"] = dense_layer_init(
            jax.random.fold_in(rng, i), in_ch + i * GROWTH_RATE, dtype=dtype
        )
    return params


def dense_block_apply(params: dict, x: jax.Array, bn: BNCtx = DEFAULT_BN) -> jax.Array:
    for i in range(len(params)):
        name = f"denselayer{i + 1}"
        x = dense_layer_apply(params[name], x, bn.sub(name))
    return x


def transition_init(rng, in_ch: int, out_ch: int, dtype=jnp.float32) -> dict:
    return {
        "norm": batch_norm_init(in_ch, dtype),
        "conv": conv2d_init(rng, in_ch, out_ch, 1, bias=False, dtype=dtype),
    }


def transition_apply(params: dict, x: jax.Array, bn: BNCtx = DEFAULT_BN) -> jax.Array:
    h = conv2d(params["conv"], relu(bn(params["norm"], x, "norm")), padding=0)
    return avg_pool(h, 2)


def densenet_stem_init(rng, dtype=jnp.float32) -> dict:
    """conv0 (7×7 s2 p3, bias-free) + norm0 of torchvision densenet121."""
    return {
        "conv0": conv2d_init(rng, 3, INIT_FEATURES, 7, bias=False, dtype=dtype),
        "norm0": batch_norm_init(INIT_FEATURES, dtype),
    }


def block_out_channels(in_ch: int, num_layers: int) -> int:
    return in_ch + num_layers * GROWTH_RATE
