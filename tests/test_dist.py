"""Distribution tests on the simulated 8-device CPU mesh: DP sharded forward
equals single-device, spatially-sharded conv correctness, tiled inference
equals untiled."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from fdgan_tpu.dist.mesh import batch_sharding, make_mesh, replicate_sharding, shard_batch, shard_params
from fdgan_tpu.dist.tiling import tiled_apply


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    mesh2 = make_mesh(n_data=4, n_spatial=2)
    assert mesh2.shape == {"data": 4, "spatial": 2}
    with pytest.raises(ValueError):
        make_mesh(n_data=3, n_spatial=2)


def test_dp_forward_matches_single_device(rng, np_rng):
    """Sharded-batch conv stack == unsharded result."""
    from fdgan_tpu.models.discriminators import nlayer_apply, nlayer_init

    params = nlayer_init(rng, input_nc=3)
    x = jnp.asarray(np_rng.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32))
    ref = nlayer_apply(params, x)

    mesh = make_mesh()
    xs = jax.device_put(x, batch_sharding(mesh))
    ps = shard_params(params, mesh)
    got = jax.jit(nlayer_apply)(ps, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_spatial_sharding_conv_correct(rng, np_rng):
    """H-axis sharding with XLA halo exchange: results equal replicated run."""
    from fdgan_tpu.nn.layers import conv2d, conv2d_init

    params = conv2d_init(rng, 3, 8, 3)
    x = jnp.asarray(np_rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    ref = conv2d(params, x, padding=1)

    mesh = make_mesh(n_data=2, n_spatial=4)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "spatial")))
    ps = shard_params(params, mesh)
    got = jax.jit(lambda p, v: conv2d(p, v, padding=1))(ps, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_train_step_dp(rng):
    """One full adversarial train step over the 8-device mesh."""
    from fdgan_tpu.losses.composite import LossWeights
    from fdgan_tpu.train.loop import create_train_state, make_train_step

    state, tx_g, tx_d = create_train_state(rng)
    step = make_train_step(tx_g, tx_d, LossWeights(perceptual=0.0))
    mesh = make_mesh()
    haze = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3))
    gt = jax.random.uniform(jax.random.PRNGKey(2), (8, 32, 32, 3))
    hs, gs = shard_batch((haze, gt), mesh)
    state = jax.tree.map(lambda x: jax.device_put(x, replicate_sharding(mesh)), state)
    new_state, metrics = step(state, hs, gs, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["g_total"]))
    assert np.isfinite(float(metrics["d_total"]))


def test_tiled_apply_identity_fn(np_rng):
    x = jnp.asarray(np_rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    got = tiled_apply(lambda t: t * 2.0, x, tile=32, halo=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x) * 2.0, atol=1e-6)


def test_tiled_apply_small_image_direct(np_rng):
    x = jnp.asarray(np_rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    got = tiled_apply(lambda t: t + 1.0, x, tile=32, halo=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x) + 1.0)


def test_tiled_conv_matches_untiled(rng, np_rng):
    """A conv (receptive field 3) with halo ≥ 1 must be exactly stitched."""
    from fdgan_tpu.nn.layers import conv2d, conv2d_init

    params = conv2d_init(rng, 3, 4, 3)
    x = jnp.asarray(np_rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    fn = lambda t: conv2d(params, t, padding=1)
    ref = fn(x)
    got = tiled_apply(fn, x, tile=32, halo=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fdgan_forward_dp_sp_matches_single(rng, np_rng):
    """Full FDGAN forward on a (data=2, spatial=4) mesh == single device.
    Batch-stats BN all-reduces across shards, so outputs must be identical
    up to fp reassociation."""
    from fdgan_tpu.models import fdgan

    params = fdgan.init(rng)
    x = jnp.asarray(np_rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    ref = np.asarray(jax.jit(fdgan.apply)(params, x))

    mesh = make_mesh(n_data=2, n_spatial=4)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "spatial")))
    ps = shard_params(params, mesh)
    got = np.asarray(jax.jit(fdgan.apply)(ps, xs))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)
