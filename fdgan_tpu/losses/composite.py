"""Composite G / D objectives of the reconstructed FD-GAN training loop
(SURVEY.md §3.4): adversarial BCE through the fusion-discriminator +
pixel (L1/MSE) + VGG perceptual + (1 − SSIM) [+ optional contextual].

Loss weights were never published by the reference; they are exposed here as
a dataclass with conventional pix2pix-style defaults and surfaced as CLI
flags by ``fdgan_tpu.cli.train``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from fdgan_tpu.losses.contextual import contextual_loss
from fdgan_tpu.losses.gan import d_loss as _d_loss
from fdgan_tpu.losses.gan import g_adv_loss
from fdgan_tpu.losses.perceptual import perceptual_loss
from fdgan_tpu.models.discriminators import fusion_apply
from fdgan_tpu.ops.ssim import ssim


@dataclasses.dataclass(frozen=True)
class LossWeights:
    adv: float = 1.0
    pixel: float = 100.0
    pixel_norm: str = "l1"  # 'l1' | 'mse'
    perceptual: float = 1.0
    ssim: float = 1.0
    contextual: float = 0.0  # optional term (loss.pyc 23-73)


def pixel_loss(x: jax.Array, y: jax.Array, norm: str) -> jax.Array:
    diff = (x - y).astype(jnp.float32)
    return jnp.mean(jnp.abs(diff)) if norm == "l1" else jnp.mean(diff**2)


def generator_loss(
    d_params: dict,
    x_hat: jax.Array,
    gt: jax.Array,
    weights: LossWeights,
    vgg_params: Optional[dict] = None,
) -> tuple[jax.Array, dict]:
    """Full generator objective.

    Range contract (enforced here, at the loss ingress): ``x_hat`` is the
    generator's native tanh output in [-1, 1]; ``gt`` is in **[0, 1]** —
    exactly what the h5 pipeline stores (generate_testsample writes [0,1]
    and `get_loader` applies no transform, reproducing the reference's
    empty transform chain, misc.py:42-51). Every term — adversarial,
    pixel, perceptual, SSIM, contextual — compares the [0, 1] views, so
    the discriminator sees matched real/fake distributions."""
    x01 = (x_hat + 1.0) * 0.5
    y01 = gt

    terms = {}
    total = jnp.asarray(0.0, jnp.float32)

    # zero-weight terms are gated out in Python (not just scaled by 0) so
    # XLA never builds their graphs — an ablation/reconstruction-only run
    # skips the fusion-D forward + backward entirely
    if weights.adv > 0:
        d_fake = fusion_apply(d_params, x01)
        terms["adv"] = g_adv_loss(d_fake)
        total += weights.adv * terms["adv"]

    terms["pixel"] = pixel_loss(x01, y01, weights.pixel_norm)
    total += weights.pixel * terms["pixel"]

    if vgg_params is not None and weights.perceptual > 0:
        terms["perceptual"] = perceptual_loss(vgg_params, x01, y01)
        total += weights.perceptual * terms["perceptual"]

    if weights.ssim > 0:
        terms["ssim"] = ssim(x01, y01)
        total += weights.ssim * (1.0 - terms["ssim"])

    if weights.contextual > 0 and vgg_params is not None:
        from fdgan_tpu.models import vgg16

        # CX on relu3_3 features (downsampled enough for the quadratic cost)
        f_hat = vgg16.apply(vgg_params, x01)[2]
        f_gt = vgg16.apply(vgg_params, y01)[2]
        terms["contextual"] = contextual_loss(f_hat, f_gt)
        total += weights.contextual * terms["contextual"]

    terms["total"] = total
    return total, terms


def discriminator_loss(
    d_params: dict,
    x_hat: jax.Array,
    gt: jax.Array,
    real_label: float = 1.0,
) -> tuple[jax.Array, dict]:
    """Fusion-D objective: BCE(D(fuse(gt)),real_label) + BCE(D(fuse(x̂.detach())),0).

    Same range contract as ``generator_loss``: ``x_hat`` tanh [-1,1],
    ``gt`` [0,1]. ``real_label`` < 1 enables one-sided label smoothing
    (D-saturation fix — see losses.gan.d_loss)."""
    x01 = jax.lax.stop_gradient((x_hat + 1.0) * 0.5)
    y01 = gt
    d_real = fusion_apply(d_params, y01)
    d_fake = fusion_apply(d_params, x01)
    loss = _d_loss(d_real, d_fake, real_label)
    return loss, {"d_total": loss, "d_real": jnp.mean(d_real), "d_fake": jnp.mean(d_fake)}
