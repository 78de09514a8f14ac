"""Legacy DCPDN family tests: U-Net G/G2 shapes, Dense transmission
generator, physical-scattering composition, custom DenseNet dehaze net."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fdgan_tpu.models import dcpdn, densenet_dehaze


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


def test_unet_g_shapes(key):
    p = dcpdn.unet_g_init(key, nf=8)  # small nf for test speed
    x = jnp.zeros((1, 256, 256, 3))
    y = dcpdn.unet_g_apply(p, x)
    assert y.shape == (1, 256, 256, 3)
    assert (np.abs(np.asarray(y)) <= 1).all()


def test_unet_g2_shapes(key):
    p = dcpdn.unet_g2_init(key, nf=8)
    y = dcpdn.unet_g2_apply(p, jnp.zeros((1, 256, 256, 3)))
    assert y.shape == (1, 256, 256, 3)


def test_dense_g_pyramid(key, np_rng):
    p = dcpdn.dense_g_init(key, pyramid=True)
    x = jnp.asarray(np_rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    y = dcpdn.dense_g_apply(p, x, pyramid=True)
    assert y.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(y)).all()


def test_dense_g_no_pyramid(key, np_rng):
    p = dcpdn.dense_g_init(key, pyramid=False)
    assert "batchnorm20" in p
    x = jnp.asarray(np_rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    y = dcpdn.dense_g_apply(p, x, pyramid=False)
    assert y.shape == (1, 64, 64, 3)


def test_dehaze_physical(key, np_rng):
    p = dcpdn.dehaze_physical_init(key)
    assert "tran_est" in p  # dead U-Net carried for ckpt parity (dehaze22.py:665)
    x = jnp.asarray(np_rng.uniform(0, 1, (1, 256, 256, 3)).astype(np.float32))
    out, tran, atp, dehaze2 = dcpdn.dehaze_physical_apply(p, x)
    assert out.shape == x.shape
    assert tran.shape == x.shape
    assert dehaze2.shape == x.shape
    for t in (out, tran, atp, dehaze2):
        assert np.isfinite(np.asarray(t)).all()


def test_densenet_dehaze(key, np_rng):
    p = densenet_dehaze.init(key)
    x = jnp.asarray(np_rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    y = densenet_dehaze.apply(p, x)
    assert y.shape == (1, 64, 64, 3)
    assert (np.abs(np.asarray(y)) <= 1).all()


def test_densenet_dehaze_remat_grad(key, np_rng):
    """remat path: gradients flow and match non-remat values."""
    p = densenet_dehaze.init(key)
    x = jnp.asarray(np_rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))

    def loss(params, remat):
        return jnp.mean(densenet_dehaze.apply(params, x, bn_mode="running", remat=remat) ** 2)

    g1 = jax.grad(lambda q: loss(q, False))(p)
    g2 = jax.grad(lambda q: loss(q, True))(p)
    l1 = jax.tree.leaves(g1)
    l2 = jax.tree.leaves(g2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
