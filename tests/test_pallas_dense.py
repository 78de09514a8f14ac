"""Fused Pallas dense-layer kernel vs the XLA densenet path (interpreter
mode on CPU — same kernel the TPU compiles)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fdgan_tpu.models import densenet
from fdgan_tpu.models.blocks import BNCtx
from fdgan_tpu.ops.pallas_dense import (
    build_halo,
    channel_stats,
    dense_block_fused,
    fold_bn,
    fused_dense_layer,
    h_batch_stats,
)


@pytest.fixture(scope="module")
def layer_setup():
    rng = jax.random.PRNGKey(0)
    c = 64
    params = densenet.dense_layer_init(rng, c)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 24, c), jnp.float32)
    return params, x


def test_build_halo(np_rng):
    x = jnp.asarray(np_rng.standard_normal((1, 8, 4, 2)).astype(np.float32))
    halo = build_halo(x, 4)
    assert halo.shape == (1, 2, 2, 4, 2)
    np.testing.assert_array_equal(np.asarray(halo[0, 0, 0]), 0)  # top of tile 0
    np.testing.assert_array_equal(np.asarray(halo[0, 0, 1]), np.asarray(x[0, 4]))
    np.testing.assert_array_equal(np.asarray(halo[0, 1, 0]), np.asarray(x[0, 3]))
    np.testing.assert_array_equal(np.asarray(halo[0, 1, 1]), 0)  # bottom of last


def test_fused_layer_running_mode(layer_setup):
    params, x = layer_setup
    ref = densenet.dense_layer_apply(params, x, BNCtx("running"))

    a1, b1 = fold_bn(**params["norm1"])
    a2, b2 = fold_bn(**params["norm2"])
    f = fused_dense_layer(
        x, a1, b1, params["conv1"]["kernel"], a2, b2, params["conv2"]["kernel"],
        tile_h=4, interpret=True,
    )
    got = jnp.concatenate([x, f], axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-3)


def test_phase_a_stats(layer_setup):
    params, x = layer_setup
    # oracle: materialise h with the XLA ops
    from fdgan_tpu.nn.layers import batch_norm, conv2d, relu

    h_ref = conv2d(params["conv1"], relu(batch_norm(params["norm1"], x, mode="batch")), padding=0)
    m_ref = jnp.mean(h_ref.astype(jnp.float32), axis=(0, 1, 2))
    v_ref = jnp.var(h_ref.astype(jnp.float32), axis=(0, 1, 2))

    m1, v1 = channel_stats(x)
    a1, b1 = fold_bn(params["norm1"]["scale"], params["norm1"]["bias"], m1, v1)
    m, v = h_batch_stats(x, a1, b1, params["conv1"]["kernel"], tile_h=4, interpret=True)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=1e-4, rtol=1e-3)


def test_dense_block_fused_batch_mode(rng):
    """Full block, batch-stats mode — must match the XLA reference path."""
    c, layers = 32, 3
    params = densenet.dense_block_init(rng, c, layers)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, c), jnp.float32)

    ref = densenet.dense_block_apply(params, x, BNCtx("batch"))
    got = dense_block_fused(params, x, mode="batch", interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4, rtol=1e-3)


def test_fused_layer_grad_matches_xla(layer_setup):
    """Custom VJP: grads through the Pallas layer == grads through the XLA
    twin, for every input (x, affines, weights)."""
    params, x = layer_setup
    a1, b1 = fold_bn(**params["norm1"])
    a2, b2 = fold_bn(**params["norm2"])
    w1, w2 = params["conv1"]["kernel"], params["conv2"]["kernel"]

    from fdgan_tpu.ops.pallas_dense import _layer_reference

    def loss_pallas(x, a1, b1, w1, a2, b2, w2):
        f = fused_dense_layer(x, a1, b1, w1, a2, b2, w2, tile_h=4, interpret=True)
        return jnp.sum(f * f)

    def loss_ref(x, a1, b1, w1, a2, b2, w2):
        f = _layer_reference(x, a1, b1, w1, a2, b2, w2)
        return jnp.sum(f * f)

    args = (x, a1, b1, w1, a2, b2, w2)
    g_pallas = jax.grad(loss_pallas, argnums=tuple(range(7)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for gp, gr in zip(g_pallas, g_ref):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr), atol=2e-2, rtol=1e-3)


def test_dense_block_fused_grad_finite(rng):
    """Whole block differentiable in batch mode (stats kernels included)."""
    params = densenet.dense_block_init(rng, 32, 2)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 8, 8, 32), jnp.float32)

    def loss(p):
        return jnp.mean(dense_block_fused(p, x, mode="batch", interpret=True) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # conv kernels must receive non-zero gradient
    g1 = grads["denselayer1"]["conv2"]["kernel"]
    assert float(jnp.abs(g1).max()) > 0


def test_fdgan_pallas_forward_matches_xla(rng):
    from fdgan_tpu.models import fdgan

    params = fdgan.init(rng)
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 32, 32, 3), jnp.float32)
    stats_x, stats_p = {}, {}
    ref = fdgan.apply(params, x, stats_out=stats_x)
    got = fdgan.apply(params, x, stats_out=stats_p, impl="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4, rtol=1e-3)
    # same stats keys, same values (the train step folds these)
    dense_keys = {k for k in stats_x if ".denselayer" in k}
    assert dense_keys == {k for k in stats_p if ".denselayer" in k}
    for k in sorted(dense_keys):
        np.testing.assert_allclose(
            np.asarray(stats_p[k][0]), np.asarray(stats_x[k][0]), atol=1e-4, rtol=1e-3
        )


def test_train_step_pallas_interpret(rng):
    """The full adversarial train step runs with impl='pallas' (interpret)."""
    from fdgan_tpu.losses.composite import LossWeights
    from fdgan_tpu.train.loop import create_train_state, make_train_step

    state, tx_g, tx_d = create_train_state(rng)
    step = make_train_step(
        tx_g, tx_d, LossWeights(perceptual=0.0),
        impl="pallas", interpret=True,
    )
    gt = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
    haze = jnp.clip(gt * 0.6 + 0.3, 0, 1)
    state, metrics = step(state, haze, gt, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["g_total"]))
    assert np.isfinite(float(metrics["d_total"]))


def test_train_step_remat_matches(rng):
    """--remat changes memory, not math: one step with and without remat
    produces identical losses."""
    from fdgan_tpu.losses.composite import LossWeights
    from fdgan_tpu.train.loop import create_train_state, make_train_step

    gt = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
    haze = jnp.clip(gt * 0.6 + 0.3, 0, 1)
    outs = []
    for remat in (False, True):
        state, tx_g, tx_d = create_train_state(rng)
        step = make_train_step(tx_g, tx_d, LossWeights(perceptual=0.0), remat=remat)
        _, metrics = step(state, haze, gt, jax.random.PRNGKey(2))
        outs.append(float(metrics["g_total"]))
    assert outs[0] == pytest.approx(outs[1], rel=1e-6)


def test_dense_block_fused_running_mode(rng):
    c, layers = 32, 2
    params = densenet.dense_block_init(rng, c, layers)
    # randomise running stats so the mode actually differs from batch
    for i in range(layers):
        lp = params[f"denselayer{i + 1}"]
        for nk in ("norm1", "norm2"):
            lp[nk]["mean"] = 0.1 * jax.random.normal(jax.random.fold_in(rng, i * 7 + hash(nk) % 5), lp[nk]["mean"].shape)
            lp[nk]["var"] = 1.0 + 0.1 * jax.random.uniform(jax.random.fold_in(rng, i * 11 + 3), lp[nk]["var"].shape)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, c), jnp.float32)
    ref = densenet.dense_block_apply(params, x, BNCtx("running"))
    got = dense_block_fused(params, x, mode="running", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4, rtol=1e-3)
