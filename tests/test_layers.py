"""NN layer numerics vs torch-CPU oracles: conv, transposed conv, batch
norm, pooling, upsampling. These pin down the layout conventions every model
relies on (NHWC/HWIO, torch-import transposes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fdgan_tpu.models.blocks import conv_transpose2d
from fdgan_tpu.nn.layers import (
    avg_pool,
    batch_norm,
    batch_norm_init,
    conv2d,
    elu,
    leaky_relu,
    max_pool,
    upsample_nearest,
    upsample_nearest_to,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _np(x):
    return np.asarray(x)


def test_conv2d_vs_torch(np_rng):
    x = np_rng.standard_normal((2, 12, 12, 5)).astype(np.float32)
    w = np_rng.standard_normal((7, 5, 3, 3)).astype(np.float32)  # OIHW
    b = np_rng.standard_normal((7,)).astype(np.float32)
    params = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)}
    got = _np(conv2d(params, jnp.asarray(x), stride=2, padding=1))
    ref = F.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w), torch.from_numpy(b), 2, 1
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_conv_transpose2d_vs_torch(np_rng):
    x = np_rng.standard_normal((2, 8, 8, 6)).astype(np.float32)
    w = np_rng.standard_normal((6, 4, 4, 4)).astype(np.float32)  # torch (I,O,kh,kw)
    params = {"kernel": jnp.asarray(w.transpose(2, 3, 0, 1))}  # → (kh,kw,I,O)
    got = _np(conv_transpose2d(params, jnp.asarray(x), stride=2, padding=1))
    ref = F.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w), stride=2, padding=1
    ).numpy().transpose(0, 2, 3, 1)
    assert got.shape == ref.shape == (2, 16, 16, 4)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_conv_transpose2d_1x1_vs_torch(np_rng):
    """The Transition blocks' stride-1 1×1 ConvTranspose2d ≡ 1×1 conv."""
    x = np_rng.standard_normal((1, 6, 6, 8)).astype(np.float32)
    w = np_rng.standard_normal((8, 3, 1, 1)).astype(np.float32)
    params = {"kernel": jnp.asarray(w.transpose(2, 3, 0, 1))}
    got = _np(conv2d(params, jnp.asarray(x), padding=0))
    ref = F.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w), stride=1, padding=0
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_batch_norm_batch_mode_vs_torch(np_rng):
    x = np_rng.standard_normal((4, 6, 6, 3)).astype(np.float32)
    p = batch_norm_init(3)
    p["scale"] = jnp.asarray(np_rng.standard_normal(3).astype(np.float32))
    p["bias"] = jnp.asarray(np_rng.standard_normal(3).astype(np.float32))
    got = _np(batch_norm(p, jnp.asarray(x), mode="batch"))
    # torch train-mode BN (the reference's published inference mode)
    ref = F.batch_norm(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.zeros(3),
        torch.ones(3),
        torch.from_numpy(_np(p["scale"])),
        torch.from_numpy(_np(p["bias"])),
        training=True,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_batch_norm_running_mode_vs_torch(np_rng):
    x = np_rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    p = batch_norm_init(3)
    p["mean"] = jnp.asarray(np_rng.standard_normal(3).astype(np.float32))
    p["var"] = jnp.asarray(np_rng.uniform(0.5, 2.0, 3).astype(np.float32))
    got = _np(batch_norm(p, jnp.asarray(x), mode="running"))
    ref = F.batch_norm(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(_np(p["mean"])),
        torch.from_numpy(_np(p["var"])),
        torch.ones(3),
        torch.zeros(3),
        training=False,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_avg_pool_odd_size_floor(np_rng):
    """torch F.avg_pool2d floors on odd sizes — 7→3."""
    x = np_rng.standard_normal((1, 7, 7, 2)).astype(np.float32)
    got = _np(avg_pool(jnp.asarray(x), 2))
    ref = F.avg_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), 2).numpy().transpose(0, 2, 3, 1)
    assert got.shape == (1, 3, 3, 2)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_max_pool_with_padding_vs_torch(np_rng):
    x = np_rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
    got = _np(max_pool(jnp.asarray(x), 3, stride=2, padding=1))
    ref = F.max_pool2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), 3, 2, 1
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_upsample_nearest_vs_torch(np_rng):
    x = np_rng.standard_normal((1, 4, 4, 3)).astype(np.float32)
    got = _np(upsample_nearest(jnp.asarray(x), 2))
    ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=2, mode="nearest")
    np.testing.assert_allclose(got, ref.numpy().transpose(0, 2, 3, 1), atol=1e-6)


def test_upsample_nearest_to_size_vs_torch(np_rng):
    x = np_rng.standard_normal((1, 3, 3, 2)).astype(np.float32)
    got = _np(upsample_nearest_to(jnp.asarray(x), (9, 6)))
    ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(9, 6), mode="nearest")
    np.testing.assert_allclose(got, ref.numpy().transpose(0, 2, 3, 1), atol=1e-6)


def test_activations_vs_torch(np_rng):
    x = np_rng.standard_normal((64,)).astype(np.float32)
    np.testing.assert_allclose(
        _np(leaky_relu(jnp.asarray(x), 0.2)), F.leaky_relu(torch.from_numpy(x), 0.2).numpy(), atol=1e-6
    )
    np.testing.assert_allclose(_np(elu(jnp.asarray(x))), F.elu(torch.from_numpy(x)).numpy(), atol=1e-6)


def test_batch_stats_dtype_split(np_rng):
    """fp32 path must equal jnp.var exactly (torch parity depends on the
    cancellation-free two-pass form); bf16 one-pass must agree to within
    bf16 input noise."""
    import jax.numpy as jnp

    from fdgan_tpu.nn.layers import _batch_stats

    x = np_rng.normal(3.0, 0.05, (4, 16, 16, 8)).astype(np.float32)  # mean >> std
    m32, v32 = _batch_stats(jnp.asarray(x), axis=(0, 1, 2))
    np.testing.assert_array_equal(np.asarray(m32), np.mean(x, axis=(0, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(v32), np.var(x, axis=(0, 1, 2)), rtol=1e-6
    )
    xb = jnp.asarray(x, jnp.bfloat16)
    mb, vb = _batch_stats(xb, axis=(0, 1, 2))
    assert mb.dtype == jnp.float32 and vb.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(mb), np.mean(x, axis=(0, 1, 2)), rtol=1e-2)
    # var of a (μ=3, σ=0.05) input: bf16 quantisation noise (~δ²/12) is the
    # error floor; one-pass fp32 cancellation must stay within that regime
    np.testing.assert_allclose(
        np.asarray(vb), np.var(x, axis=(0, 1, 2)), rtol=0.5, atol=2e-4
    )
    assert (np.asarray(vb) >= 0).all()
