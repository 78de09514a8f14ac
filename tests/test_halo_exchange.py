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


def test_halo_exchange_stride2(rng, np_rng):
    """3×3 s2 p1 (the reference's downsampling conv shape): trailing halo is
    zero, outputs partition evenly."""
    params = conv2d_init(rng, 4, 8, 3)
    x = jnp.asarray(np_rng.uniform(-1, 1, (1, 64, 16, 4)).astype(np.float32))
    ref = conv2d(params, x, padding=1, stride=2)
    mesh = make_mesh(n_data=1, n_spatial=8)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "spatial")))
    got = conv2d_halo_sharded(params, xs, mesh, padding=1, stride=2)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_halo_exchange_4x4_stride2(rng, np_rng):
    """blockUNet's 4×4 s2 p1 conv (even kernel, asymmetric halo)."""
    params = conv2d_init(rng, 3, 8, 4)
    x = jnp.asarray(np_rng.uniform(-1, 1, (1, 64, 16, 3)).astype(np.float32))
    ref = conv2d(params, x, padding=1, stride=2)
    mesh = make_mesh(n_data=1, n_spatial=8)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "spatial")))
    got = conv2d_halo_sharded(params, xs, mesh, padding=1, stride=2)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_halo_exchange_w_axis(rng, np_rng):
    params = conv2d_init(rng, 3, 4, 3)
    x = jnp.asarray(np_rng.uniform(-1, 1, (1, 16, 64, 3)).astype(np.float32))
    ref = conv2d(params, x, padding=1)
    mesh = make_mesh(n_data=1, n_spatial=8)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, None, "spatial")))
    got = conv2d_halo_sharded(params, xs, mesh, padding=1, dim="W")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_halo_exchange_fdgan_encoder_stage(rng, np_rng):
    """Integration: FDGAN's first encoder stage (conv_refin1 3×3 + the
    trans_block1 7×7-free path shapes) run H-sharded through the manual
    halo exchange, matching the GSPMD automatic partitioner bit-for-bit."""
    from fdgan_tpu.models import fdgan
    from fdgan_tpu.nn.layers import relu

    params = fdgan.init(rng)
    x = jnp.asarray(np_rng.uniform(0, 1, (1, 64, 32, 3)).astype(np.float32))
    mesh = make_mesh(n_data=1, n_spatial=8)
    sh = NamedSharding(mesh, P(None, "spatial"))

    # GSPMD path: jit the stage over the sharded input
    def stage(p, v):
        return relu(conv2d(p["conv_refin1"], v, padding=1))

    auto = jax.jit(stage)(params, jax.device_put(x, sh))

    manual = relu(conv2d_halo_sharded(params["conv_refin1"], jax.device_put(x, sh), mesh))
    np.testing.assert_allclose(np.asarray(manual), np.asarray(auto), atol=1e-6)
    # and the manual result matches the unsharded oracle
    np.testing.assert_allclose(np.asarray(manual), np.asarray(stage(params, x)), atol=1e-5)
