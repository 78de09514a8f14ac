from fdgan_tpu.models import blocks, dcpdn, densenet, discriminators, fdgan, vgg16

__all__ = ["blocks", "dcpdn", "densenet", "discriminators", "fdgan", "vgg16"]
