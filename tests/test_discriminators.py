"""Discriminator family tests: PatchGAN map shapes, fusion input, BEGAN
autoencoder reconstruction shape."""

import numpy as np

import jax
import jax.numpy as jnp

from fdgan_tpu.models.discriminators import (
    began_d_apply,
    began_d_init,
    fusion_apply,
    nlayer_apply,
    nlayer_init,
    patch_d_apply,
    patch_d_init,
)


def test_nlayer_shapes(rng):
    params = nlayer_init(rng, input_nc=9)
    x = jnp.zeros((2, 64, 64, 9))
    y = nlayer_apply(params, x)
    # 3 stride-2 convs: 64 → 32 → 16 → 8, then two stride-1 k4 p1 convs: 8→7→6
    assert y.shape == (2, 6, 6, 1)
    assert (np.asarray(y) >= 0).all() and (np.asarray(y) <= 1).all()


def test_nlayer_no_sigmoid(rng):
    params = nlayer_init(rng, input_nc=3)
    y = nlayer_apply(params, jnp.zeros((1, 64, 64, 3)), use_sigmoid=False)
    assert y.shape == (1, 6, 6, 1)


def test_fusion_discriminator(rng, np_rng):
    """The fusion-D consumes the 9-channel frequency decomposition."""
    params = nlayer_init(rng, input_nc=9)
    x = jnp.asarray(np_rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    y = fusion_apply(params, x)
    assert y.shape == (1, 6, 6, 1)
    assert np.isfinite(np.asarray(y)).all()


def test_patch_d_shapes(rng):
    params = patch_d_init(rng, nc=3, nf=64)
    y = patch_d_apply(params, jnp.zeros((1, 64, 64, 3)))
    # one stride-2 conv (64→32), then s1 convs: k3 keep 32, k4p1: 32→31→30
    assert y.shape == (1, 30, 30, 1)


def test_began_d_reconstructs_input_shape(rng):
    params = began_d_init(rng, nc=3, ndf=16, hidden_size=16)
    x = jnp.zeros((1, 32, 32, 3))
    y = began_d_apply(params, x)
    assert y.shape == x.shape
    assert (np.abs(np.asarray(y)) <= 1).all()


def test_gradients_flow(rng, np_rng):
    params = nlayer_init(rng, input_nc=9)
    x = jnp.asarray(np_rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    g = jax.grad(lambda p: jnp.mean(fusion_apply(p, x)))(params)
    norms = [float(jnp.abs(v).sum()) for v in jax.tree.leaves(g)]
    assert any(n > 0 for n in norms)
