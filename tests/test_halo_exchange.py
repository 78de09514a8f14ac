"""Manual ppermute halo-exchange conv == unsharded conv on the 8-device mesh."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from fdgan_tpu.dist.halo_exchange import conv2d_halo_sharded
from fdgan_tpu.dist.mesh import make_mesh
from fdgan_tpu.nn.layers import conv2d, conv2d_init


def test_halo_exchange_conv_matches(rng, np_rng):
    params = conv2d_init(rng, 6, 8, 3)
    x = jnp.asarray(np_rng.uniform(-1, 1, (2, 64, 32, 6)).astype(np.float32))
    ref = conv2d(params, x, padding=1)

    mesh = make_mesh(n_data=1, n_spatial=8)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "spatial")))
    got = conv2d_halo_sharded(params, xs, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_halo_exchange_5x5(rng, np_rng):
    params = conv2d_init(rng, 3, 4, 5)
    x = jnp.asarray(np_rng.uniform(-1, 1, (1, 32, 16, 3)).astype(np.float32))
    ref = conv2d(params, x, padding=2)
    mesh = make_mesh(n_data=1, n_spatial=8)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "spatial")))
    got = conv2d_halo_sharded(params, xs, mesh, padding=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
