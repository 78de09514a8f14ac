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


def test_device_pool_query_semantics():
    """Pure-JAX ImagePool.query (pool.device_pool_query) reproduces the
    reference semantics (misc.py:146-161): fill phase is a passthrough
    that stores, the full phase either swaps with a random slot (returning
    its previous content) or passes through, n_filled saturates."""
    from fdgan_tpu.train.pool import device_pool_init, device_pool_query

    buf, n = device_pool_init(2, (1, 4, 4, 3), jnp.float32)
    imgs = [jnp.full((1, 4, 4, 3), float(i)) for i in range(6)]

    # fill phase: both queries pass through and store
    buf, n, out0 = device_pool_query(buf, n, imgs[0], jax.random.PRNGKey(0))
    assert float(out0[0, 0, 0, 0]) == 0.0 and int(n) == 1
    buf, n, out1 = device_pool_query(buf, n, imgs[1], jax.random.PRNGKey(1))
    assert float(out1[0, 0, 0, 0]) == 1.0 and int(n) == 2
    assert float(buf[0, 0, 0, 0, 0]) == 0.0 and float(buf[1, 0, 0, 0, 0]) == 1.0

    # full phase: outputs are either the incoming batch (no-swap) or one of
    # the stored batches (swap, which replaces the slot with the new batch)
    stored = {0.0, 1.0}
    swaps = passes = 0
    for k, img in enumerate(imgs[2:], start=2):
        buf, n, out = device_pool_query(buf, n, img, jax.random.PRNGKey(k))
        assert int(n) == 2
        v = float(out[0, 0, 0, 0])
        if v == float(k):
            passes += 1
            # pass-through must leave the buffer unchanged
        else:
            swaps += 1
            assert v in stored
            stored.discard(v)
            stored.add(float(k))
        buf_vals = {float(buf[i, 0, 0, 0, 0]) for i in range(2)}
        assert buf_vals == stored
    assert swaps >= 1 and passes >= 1  # both branches exercised (4 draws)


def test_device_pool_loop_runs_and_updates_d(rng):
    """make_device_pool_loop: split G/D steps + device pool inside one scan
    — finite metrics, step count advances, D weights move."""
    from fdgan_tpu.train.loop import make_device_pool_loop
    from fdgan_tpu.train.pool import device_pool_init

    state, tx_g, tx_d = create_train_state(rng)
    g_step, d_step = make_gd_steps(tx_g, tx_d, LossWeights(perceptual=0.0))
    run = make_device_pool_loop(g_step, d_step, chunk_steps=3)

    nb, b = 2, 1
    haze_all = jax.random.uniform(jax.random.PRNGKey(1), (nb, b, 32, 32, 3))
    gt_all = jax.random.uniform(jax.random.PRNGKey(2), (nb, b, 32, 32, 3))
    pool_buf, n_filled = device_pool_init(2, (b, 32, 32, 3), jnp.float32)
    idx = jnp.asarray([0, 1, 0], jnp.int32)

    d_before = np.asarray(state.d_params["model"]["0"]["kernel"])
    state, pool_buf, n_filled, ms = run(
        state, pool_buf, n_filled, haze_all, gt_all, idx,
        jnp.asarray(0, jnp.int32), jax.random.PRNGKey(3),
    )
    assert int(state.step) == 3
    assert int(n_filled) >= 1
    for k in ("g_total", "d_total", "d_real", "d_fake"):
        assert np.all(np.isfinite(np.asarray(ms[k]))), k
    assert not np.allclose(d_before, np.asarray(state.d_params["model"]["0"]["kernel"]))
