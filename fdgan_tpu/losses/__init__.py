from fdgan_tpu.losses.gan import bce, d_loss, g_adv_loss
from fdgan_tpu.losses.perceptual import perceptual_loss
from fdgan_tpu.losses.contextual import contextual_loss
from fdgan_tpu.losses.composite import LossWeights, generator_loss, discriminator_loss

__all__ = [
    "bce",
    "d_loss",
    "g_adv_loss",
    "perceptual_loss",
    "contextual_loss",
    "LossWeights",
    "generator_loss",
    "discriminator_loss",
]
