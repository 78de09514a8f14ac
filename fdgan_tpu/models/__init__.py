from fdgan_tpu.models import (
    blocks,
    dcpdn,
    densenet,
    densenet_dehaze,
    discriminators,
    fdgan,
    vgg16,
)

__all__ = [
    "blocks",
    "dcpdn",
    "densenet",
    "densenet_dehaze",
    "discriminators",
    "fdgan",
    "vgg16",
]
