"""Split G/D steps with ImagePool — the reference's replay-buffer training
pattern (misc.py:140-161)."""

import numpy as np

import jax
import jax.numpy as jnp

from fdgan_tpu.losses.composite import LossWeights
from fdgan_tpu.train.loop import create_train_state, make_gd_steps
from fdgan_tpu.train.pool import ImagePool


def test_split_steps_with_pool(rng):
    state, tx_g, tx_d = create_train_state(rng)
    g_step, d_step = make_gd_steps(tx_g, tx_d, LossWeights(perceptual=0.0))
    pool = ImagePool(pool_size=2, seed=0)

    haze = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
    gt = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3))

    d_before = np.asarray(state.d_params["model"]["0"]["kernel"])
    for _ in range(2):
        state, g_metrics, x_hat = g_step(state, haze, gt)
        fake = pool.query(jax.lax.stop_gradient(x_hat))
        state, d_metrics = d_step(state, fake, gt)
        assert np.isfinite(float(g_metrics["g_total"]))
        assert np.isfinite(float(d_metrics["d_total"]))
    assert int(state.step) == 2
    assert not np.allclose(d_before, np.asarray(state.d_params["model"]["0"]["kernel"]))
