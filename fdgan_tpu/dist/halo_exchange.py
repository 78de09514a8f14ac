"""Explicit halo-exchange convolution over a spatially-sharded mesh axis.

The conv analog of ring-attention/context parallelism (SURVEY.md §2.8): one
image axis (H or W) is sharded across a mesh axis; each device exchanges its
boundary rows with neighbours via `jax.lax.ppermute` inside a `shard_map`,
then runs a purely local convolution on the halo-extended tile. ppermute's
semantics give zeros on the ring boundaries — exactly the conv's zero
padding.

Supports strided (downsampling) convs: for kernel k, padding p, stride s the
shard needs a leading halo of p rows and a trailing halo of k−p−s rows (for
the reference's 3×3 s2 p1 convs that trailing halo is zero — stride-2 layers
exchange *less* than stride-1). Every local shard extent must divide by s so
output rows partition evenly across devices.

GSPMD inserts equivalent halo exchanges automatically when you simply `jit`
a conv over sharded inputs (tests/test_dist.py::test_spatial_sharding_conv_
correct); this module is the hand-scheduled version for when the automatic
partitioner's choice needs overriding, and the template for fusing exchange
with compute in future kernels. Parity with GSPMD on real FDGAN encoder
shapes is enforced by tests/test_halo_exchange.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from fdgan_tpu.nn.layers import CONV_DIMS


def halo_sizes(kernel: int, padding: int, stride: int) -> tuple[int, int]:
    """(leading, trailing) halo rows a shard needs along the sharded dim."""
    lead = padding
    trail = max(kernel - padding - stride, 0)
    return lead, trail


def conv2d_halo_sharded(
    params: dict,
    x: jax.Array,
    mesh: Mesh,
    axis: str = "spatial",
    padding: int = 1,
    stride: int = 1,
    dim: str = "H",
) -> jax.Array:
    """NHWC conv with H (``dim='H'``) or W (``dim='W'``) sharded on ``axis``.

    Requirements: kernel ≥ padding (any odd/even size), each local shard's
    extent along the sharded dim divisible by ``stride`` and ≥ the halo.
    """
    kernel = params["kernel"]
    d = 1 if dim == "H" else 2
    k_sharded = kernel.shape[0] if dim == "H" else kernel.shape[1]
    lead, trail = halo_sizes(k_sharded, padding, stride)
    n = mesh.shape[axis]

    def _take(xl, start, size):
        idx = [slice(None)] * 4
        idx[d] = slice(start, start + size) if size else slice(0, 0)
        return xl[tuple(idx)]

    def local_conv(k, bias, xl):
        parts = []
        if n > 1:
            down = [(i, i + 1) for i in range(n - 1)]  # to next shard
            up = [(i + 1, i) for i in range(n - 1)]    # to previous shard
            if lead:
                # my trailing rows become the next shard's leading halo
                parts.append(jax.lax.ppermute(_take(xl, xl.shape[d] - lead, lead), axis, perm=down))
            parts.append(xl)
            if trail:
                parts.append(jax.lax.ppermute(_take(xl, 0, trail), axis, perm=up))
            xext = jnp.concatenate(parts, axis=d) if len(parts) > 1 else xl
        else:
            pad = [(0, 0)] * 4
            pad[d] = (lead, trail)
            xext = jnp.pad(xl, pad)
        # sharded dim handled by the halo; the other spatial dim locally
        conv_pad = [(0, 0), (padding, padding)] if dim == "H" else [(padding, padding), (0, 0)]
        y = jax.lax.conv_general_dilated(
            xext,
            k.astype(xext.dtype),
            (stride, stride),
            conv_pad,
            dimension_numbers=CONV_DIMS,
        )
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y

    bias = params.get("bias")
    spec = P(None, axis, None, None) if dim == "H" else P(None, None, axis, None)
    fn = jax.shard_map(
        local_conv,
        mesh=mesh,
        in_specs=(P(), P(), spec),
        out_specs=spec,
    )
    return fn(kernel, bias if bias is not None else jnp.zeros((kernel.shape[-1],), x.dtype), x)
