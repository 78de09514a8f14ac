"""VGG16 perceptual loss (reconstructed train-loop term, SURVEY.md §3.4).

Σᵢ ‖φᵢ(x̂) − φᵢ(y)‖² over the four feature maps returned by the VGG16
extractor (myutils/vgg16.py:27-49).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fdgan_tpu.models import vgg16


def perceptual_loss(vgg_params: dict, x: jax.Array, y: jax.Array, norm: str = "mse") -> jax.Array:
    fx = vgg16.apply(vgg_params, x)
    fy = vgg16.apply(vgg_params, y)
    total = jnp.asarray(0.0, jnp.float32)
    for a, b in zip(fx, fy):
        diff = (a - b).astype(jnp.float32)
        if norm == "mse":
            total = total + jnp.mean(diff**2)
        else:
            total = total + jnp.mean(jnp.abs(diff))
    return total
