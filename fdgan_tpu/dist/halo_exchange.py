"""Explicit halo-exchange convolution over a spatially-sharded mesh axis.

The conv analog of ring-attention/context parallelism (SURVEY.md §2.8): the
image H axis is sharded across the mesh's 'spatial' axis; each device
exchanges its boundary rows with neighbours via `jax.lax.ppermute` inside a
`shard_map`, then runs a purely local convolution on the halo-extended tile.
ppermute's semantics give zeros on the ring boundaries — exactly the conv's
zero padding.

GSPMD inserts equivalent halo exchanges automatically when you simply `jit`
a conv over sharded inputs (tests/test_dist.py::test_spatial_sharding_conv_
correct); this module is the hand-scheduled version for when the automatic
partitioner's choice needs overriding, and the template for fusing exchange
with compute in future kernels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from fdgan_tpu.nn.layers import CONV_DIMS


def conv2d_halo_sharded(
    params: dict,
    x: jax.Array,
    mesh: Mesh,
    axis: str = "spatial",
    padding: int = 1,
    stride: int = 1,
) -> jax.Array:
    """NHWC conv with H sharded on `axis`; odd kernels, halo == padding.

    Each local shard's H must be divisible by stride and ≥ halo.
    """
    kernel = params["kernel"]
    kh = kernel.shape[0]
    halo = padding
    assert kh == 2 * padding + 1, "halo exchange assumes SAME-style odd kernel"
    n = mesh.shape[axis]

    def local_conv(k, bias, xl):
        # send my bottom rows up-ring (they become the neighbour's top halo)
        # and my top rows down-ring
        if n > 1:
            down = [(i, i + 1) for i in range(n - 1)]  # to next shard
            up = [(i + 1, i) for i in range(n - 1)]    # to previous shard
            top_halo = jax.lax.ppermute(xl[:, -halo:], axis, perm=down)
            bot_halo = jax.lax.ppermute(xl[:, :halo], axis, perm=up)
            xext = jnp.concatenate([top_halo, xl, bot_halo], axis=1)
        else:
            xext = jnp.pad(xl, ((0, 0), (halo, halo), (0, 0), (0, 0)))
        y = jax.lax.conv_general_dilated(
            xext,
            k.astype(xext.dtype),
            (stride, stride),
            [(0, 0), (padding, padding)],  # H handled by halo, W locally
            dimension_numbers=CONV_DIMS,
        )
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y

    bias = params.get("bias")
    fn = jax.shard_map(
        partial(local_conv),
        mesh=mesh,
        in_specs=(P(), P() if bias is not None else P(), P(None, axis, None, None)),
        out_specs=P(None, axis, None, None),
    )
    return fn(kernel, bias if bias is not None else jnp.zeros((kernel.shape[-1],), x.dtype), x)
