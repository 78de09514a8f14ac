"""Adversarial (BCE) losses for the sigmoid-headed PatchGAN discriminators.

Reconstructed training semantics (SURVEY.md §3.4): the shipped discriminators
end in Sigmoid (dehaze1113.py:180-181, :223), so the GAN objective is binary
cross-entropy on probability maps, DCGAN-style.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-7


def bce(pred: jax.Array, target: float) -> jax.Array:
    """Mean binary cross-entropy of a probability map against a constant
    label (torch nn.BCELoss semantics).

    Always computed in fp32: in bf16 the upper clip bound 1−1e−7 rounds to
    exactly 1.0, so a saturated discriminator produces log(0) = −inf and
    NaNs the whole step (observed within 16 steps of bf16 training)."""
    p = jnp.clip(pred.astype(jnp.float32), _EPS, 1.0 - _EPS)
    return -jnp.mean(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))


def d_loss(d_real: jax.Array, d_fake: jax.Array, real_label: float = 1.0) -> jax.Array:
    """BCE(D(real),real_label) + BCE(D(fake),0).

    ``real_label`` < 1 is one-sided label smoothing (Salimans et al. 2016):
    it stops D from saturating on real samples, which keeps the adversarial
    gradient alive for G late in training (the D(real)→0.99 drift seen in
    the round-2 dynamics artifact)."""
    return bce(d_real, real_label) + bce(d_fake, 0.0)


def g_adv_loss(d_fake: jax.Array) -> jax.Array:
    """Non-saturating-through-labels generator term: BCE(D(fake),1)."""
    return bce(d_fake, 1.0)
