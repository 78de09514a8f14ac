"""Loss tests: BCE vs torch, composite G/D losses finite + differentiable,
contextual-loss sanity properties."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fdgan_tpu.losses.composite import LossWeights, discriminator_loss, generator_loss
from fdgan_tpu.losses.contextual import contextual_loss
from fdgan_tpu.losses.gan import bce, d_loss, g_adv_loss
from fdgan_tpu.models.discriminators import nlayer_init


def test_bce_vs_torch(np_rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    p = np_rng.uniform(0.01, 0.99, (4, 6, 6, 1)).astype(np.float32)
    got1 = float(bce(jnp.asarray(p), 1.0))
    got0 = float(bce(jnp.asarray(p), 0.0))
    t = torch.from_numpy(p)
    ref1 = float(F.binary_cross_entropy(t, torch.ones_like(t)))
    ref0 = float(F.binary_cross_entropy(t, torch.zeros_like(t)))
    assert got1 == pytest.approx(ref1, abs=1e-5)
    assert got0 == pytest.approx(ref0, abs=1e-5)


def test_d_and_g_losses(np_rng):
    real = jnp.asarray(np_rng.uniform(0.6, 0.99, (1, 6, 6, 1)).astype(np.float32))
    fake = jnp.asarray(np_rng.uniform(0.01, 0.4, (1, 6, 6, 1)).astype(np.float32))
    # a good D has low loss on confident right answers
    assert float(d_loss(real, fake)) < float(d_loss(fake, real))
    assert float(g_adv_loss(fake)) > float(g_adv_loss(real))


def test_generator_loss_terms(rng, np_rng):
    # contract: x_hat tanh [-1,1], gt [0,1] (h5-native)
    d_params = nlayer_init(rng, input_nc=9)
    x_hat = jnp.asarray(np_rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    gt = jnp.asarray(np_rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    loss, terms = generator_loss(d_params, x_hat, gt, LossWeights())
    assert np.isfinite(float(loss))
    for k in ("adv", "pixel", "ssim", "total"):
        assert k in terms
    # perfect reconstruction (x_hat's [0,1] view == gt) zeroes pixel, maxes ssim
    loss2, terms2 = generator_loss(d_params, gt * 2.0 - 1.0, gt, LossWeights())
    assert float(terms2["pixel"]) == pytest.approx(0.0, abs=1e-6)
    assert float(terms2["ssim"]) == pytest.approx(1.0, abs=1e-4)
    assert float(loss2) < float(loss)


def test_discriminator_loss_detaches(rng, np_rng):
    d_params = nlayer_init(rng, input_nc=9)
    x_hat = jnp.asarray(np_rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    gt = jnp.asarray(np_rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    loss, terms = discriminator_loss(d_params, x_hat, gt)
    assert np.isfinite(float(loss))
    assert 0 <= float(terms["d_real"]) <= 1


def test_contextual_loss_prefers_match(np_rng):
    f = jnp.asarray(np_rng.standard_normal((1, 8, 8, 16)).astype(np.float32))
    g = jnp.asarray(np_rng.standard_normal((1, 8, 8, 16)).astype(np.float32))
    same = float(contextual_loss(f, f))
    diff = float(contextual_loss(f, g))
    assert same < diff


def test_contextual_loss_differentiable(np_rng):
    f = jnp.asarray(np_rng.standard_normal((1, 4, 4, 8)).astype(np.float32))
    g = jnp.asarray(np_rng.standard_normal((1, 4, 4, 8)).astype(np.float32))
    grad = jax.grad(lambda a: contextual_loss(a, g))(f)
    assert np.isfinite(np.asarray(grad)).all()


def test_generator_loss_with_vgg(rng, np_rng):
    """Perceptual + contextual paths exercised with random VGG weights."""
    from fdgan_tpu.models import vgg16

    d_params = nlayer_init(rng, input_nc=9)
    vgg_params = vgg16.init(jax.random.fold_in(rng, 1))
    x_hat = jnp.asarray(np_rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    gt = jnp.asarray(np_rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    loss, terms = generator_loss(
        d_params, x_hat, gt, LossWeights(contextual=0.1), vgg_params=vgg_params
    )
    assert "perceptual" in terms and "contextual" in terms
    assert np.isfinite(float(loss))
    g = jax.grad(
        lambda xh: generator_loss(d_params, xh, gt, LossWeights(contextual=0.1), vgg_params)[0]
    )(x_hat)
    assert np.isfinite(np.asarray(g)).all()
