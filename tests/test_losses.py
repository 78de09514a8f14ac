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


def test_generator_loss_gates_zero_weight_terms(rng, np_rng):
    """weight=0 terms are gated out of the graph (not scaled by 0): the
    returned terms dict omits them, and the total equals the sum of the
    remaining weighted terms."""
    d_params = nlayer_init(rng, input_nc=9)
    x_hat = jnp.asarray(np_rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    gt = jnp.asarray(np_rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    loss, terms = generator_loss(
        d_params, x_hat, gt, LossWeights(adv=0.0, ssim=0.0, pixel=100.0)
    )
    assert "adv" not in terms and "ssim" not in terms
    assert float(loss) == pytest.approx(100.0 * float(terms["pixel"]), rel=1e-6)
    # gating must not change the full objective
    full, full_terms = generator_loss(d_params, x_hat, gt, LossWeights())
    manual = (
        float(full_terms["adv"])
        + 100.0 * float(full_terms["pixel"])
        + (1.0 - float(full_terms["ssim"]))
    )
    assert float(full) == pytest.approx(manual, rel=1e-5)


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


def test_contextual_loss_vs_torch_oracle(np_rng):
    """Numeric parity with the recovered ContextualLoss pyc semantics,
    re-implemented independently in torch (tests/torch_oracle.py)."""
    pytest.importorskip("torch")
    import torch

    from torch_oracle import ContextualLossOracle

    oracle = ContextualLossOracle()
    for b, h, w, c in ((1, 8, 8, 16), (2, 6, 5, 32), (3, 4, 4, 8)):
        f = np_rng.standard_normal((b, h, w, c)).astype(np.float32)
        g = np_rng.standard_normal((b, h, w, c)).astype(np.float32)
        got = float(contextual_loss(jnp.asarray(f), jnp.asarray(g)))
        ref = float(
            oracle(
                torch.from_numpy(f).permute(0, 3, 1, 2),
                torch.from_numpy(g).permute(0, 3, 1, 2),
            )
        )
        assert got == pytest.approx(ref, rel=1e-5, abs=1e-5)
    # defaults must also match on non-default hyperparameters
    f = np_rng.standard_normal((1, 6, 6, 12)).astype(np.float32)
    g = np_rng.standard_normal((1, 6, 6, 12)).astype(np.float32)
    got = float(contextual_loss(jnp.asarray(f), jnp.asarray(g), sigma=0.5, b=2.0, epsilon=1e-3))
    oracle2 = ContextualLossOracle(sigma=0.5, b=2.0, epsilon=1e-3)
    ref = float(
        oracle2(
            torch.from_numpy(f).permute(0, 3, 1, 2),
            torch.from_numpy(g).permute(0, 3, 1, 2),
        )
    )
    assert got == pytest.approx(ref, rel=1e-5, abs=1e-5)


def test_d_loss_label_smoothing():
    """real_label < 1 penalises a saturated D(real)→1 (keeps gradients alive)."""
    sat = jnp.full((1, 4, 4, 1), 0.999)
    fake = jnp.full((1, 4, 4, 1), 0.001)
    plain = float(d_loss(sat, fake))
    smooth = float(d_loss(sat, fake, real_label=0.9))
    assert plain < smooth  # saturation is no longer the optimum
    # optimum of the smoothed loss is at p = real_label
    at_opt = float(d_loss(jnp.full((1, 4, 4, 1), 0.9), fake, real_label=0.9))
    assert at_opt < smooth


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
