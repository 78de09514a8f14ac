"""VGG16 feature extractor for the perceptual loss.

Functional parity with ``myutils/vgg16.py:6-49``: 13 3×3 convs, forward
returns [relu1_2, relu2_2, relu3_3, relu4_3]. Weights come from a converted
checkpoint (`fdgan_tpu.io.torch_import.convert_vgg16`) or random init; the
reference's Lua-t7 download path (myutils/utils.py:84-94) has no offline
equivalent, so the perceptual loss is optional when weights are absent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fdgan_tpu.nn.layers import conv2d, conv2d_init, max_pool, relu

_CFG = [
    ("conv1_1", 3, 64),
    ("conv1_2", 64, 64),
    ("conv2_1", 64, 128),
    ("conv2_2", 128, 128),
    ("conv3_1", 128, 256),
    ("conv3_2", 256, 256),
    ("conv3_3", 256, 256),
    ("conv4_1", 256, 512),
    ("conv4_2", 512, 512),
    ("conv4_3", 512, 512),
    ("conv5_1", 512, 512),
    ("conv5_2", 512, 512),
    ("conv5_3", 512, 512),
]


def init(rng: jax.Array, dtype=jnp.float32) -> dict:
    return {
        name: conv2d_init(jax.random.fold_in(rng, i), cin, cout, 3, dtype=dtype)
        for i, (name, cin, cout) in enumerate(_CFG)
    }


def apply(params: dict, x: jax.Array) -> list:
    """NHWC input → [relu1_2, relu2_2, relu3_3, relu4_3] feature maps."""
    h = relu(conv2d(params["conv1_1"], x, padding=1))
    h = relu(conv2d(params["conv1_2"], h, padding=1))
    relu1_2 = h
    h = max_pool(h, 2)
    h = relu(conv2d(params["conv2_1"], h, padding=1))
    h = relu(conv2d(params["conv2_2"], h, padding=1))
    relu2_2 = h
    h = max_pool(h, 2)
    h = relu(conv2d(params["conv3_1"], h, padding=1))
    h = relu(conv2d(params["conv3_2"], h, padding=1))
    h = relu(conv2d(params["conv3_3"], h, padding=1))
    relu3_3 = h
    h = max_pool(h, 2)
    h = relu(conv2d(params["conv4_1"], h, padding=1))
    h = relu(conv2d(params["conv4_2"], h, padding=1))
    h = relu(conv2d(params["conv4_3"], h, padding=1))
    relu4_3 = h
    return [relu1_2, relu2_2, relu3_3, relu4_3]


def gram_matrix(y: jax.Array) -> jax.Array:
    """Gram matrix of NHWC features (myutils/utils.py:43-48)."""
    b, h, w, c = y.shape
    feats = y.reshape(b, h * w, c)
    return jnp.einsum("bnc,bnd->bcd", feats, feats) / (c * h * w)
