"""fdgan_tpu — a TPU-native (JAX/XLA/Pallas) re-implementation of the FD-GAN
single-image dehazing framework.

Capability parity target: WeilanAnnn/FD-GAN (AAAI 2020) — generator inference,
PSNR/SSIM evaluation, HDF5 data pipeline, and the reconstructed adversarial
training loop with the fusion-discriminator's frequency priors.

Design: NHWC tensors, HWIO conv kernels, pure-functional parameter pytrees,
`jax.jit`-compiled forward/train steps, `jax.sharding.Mesh` data parallelism,
and Pallas kernels for the depthwise frequency-filter hot path.
"""

__version__ = "0.2.0"

from fdgan_tpu import nn, ops, models, losses, data, train, dist, io, serve, utils  # noqa: F401
from fdgan_tpu.serve import InferenceEngine  # noqa: F401
