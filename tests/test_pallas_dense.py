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
