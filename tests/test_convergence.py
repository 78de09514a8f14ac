"""Training-dynamics smoke test: a few adversarial steps on a fixed tiny
batch must reduce the generator's pixel loss (the loop learns, gradients and
optimiser wiring are sane)."""

import numpy as np

import jax
import jax.numpy as jnp

from fdgan_tpu.losses.composite import LossWeights
from fdgan_tpu.train.loop import create_train_state, make_train_step


def test_pixel_loss_decreases():
    # h5-realistic range contract: haze and gt both in [0, 1] (exactly what
    # generate_testsample writes and get_loader delivers untransformed)
    state, tx_g, tx_d = create_train_state(jax.random.PRNGKey(0), lr_g=5e-4, lr_d=1e-4)
    # pixel-dominated objective so the signal is deterministic
    step = make_train_step(tx_g, tx_d, LossWeights(adv=0.01, pixel=100.0, perceptual=0.0, ssim=0.1))
    gt = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    haze = jnp.clip(gt * 0.6 + 0.3, 0, 1)  # simple airlight haze model

    losses = []
    rng = jax.random.PRNGKey(2)
    for i in range(8):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, haze, gt, sub)
        losses.append(float(metrics["g_pixel"]))
    assert all(np.isfinite(losses))
    # trend: clear monotone-ish decrease
    assert losses[-1] < losses[0] * 0.97, losses


def test_d_sees_matched_ranges():
    """With the [0,1]-gt contract, D's real and fake inputs live in the same
    domain: d_real/d_fake logits must start statistically indistinguishable
    (untrained D) rather than separable by a range artifact."""
    state, tx_g, tx_d = create_train_state(jax.random.PRNGKey(0))
    step = make_train_step(tx_g, tx_d, LossWeights(perceptual=0.0))
    gt = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    haze = jnp.clip(gt * 0.6 + 0.3, 0, 1)
    state, metrics = step(state, haze, gt, jax.random.PRNGKey(2))
    d_real, d_fake = float(metrics["d_real"]), float(metrics["d_fake"])
    assert np.isfinite(d_real) and np.isfinite(d_fake)
    # untrained D on same-range inputs: mean sigmoid logits near each other
    assert abs(d_real - d_fake) < 1.0, (d_real, d_fake)
