"""Numerics tests for the frequency-prior operators against the recovered
constants (SURVEY.md §2.9) and torch-CPU depthwise convolutions."""

import numpy as np
import pytest

import jax.numpy as jnp

from fdgan_tpu.ops.filters import (
    blur,
    frequency_fuse,
    isotropic_gaussian_kernel,
    laplacian_kernel_2d,
    laplace,
)


def test_gaussian_kernel_constants():
    k = isotropic_gaussian_kernel(15, 3.0)
    assert k.shape == (15, 15)
    assert np.isclose(k.sum(), 1.0, atol=1e-6)
    # symmetric, centre is the max
    assert np.allclose(k, k.T)
    assert np.allclose(k, k[::-1, ::-1])
    assert k[7, 7] == k.max()
    # exact value: exp(0)/sum
    ax = np.arange(-7.0, 8.0)
    ref = np.exp(-(ax[:, None] ** 2 + ax[None, :] ** 2) / 18.0)
    ref /= ref.sum()
    np.testing.assert_allclose(k, ref, rtol=1e-6)


def test_laplacian_kernel_constants():
    k = laplacian_kernel_2d(3)
    assert k[1, 1] == -8.0
    assert k.sum() == 0.0
    k5 = laplacian_kernel_2d(5)
    assert k5[2, 2] == 1.0 - 25.0
    with pytest.raises(ValueError):
        laplacian_kernel_2d(4)


def test_laplace_vs_torch(np_rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = np_rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    got = np.asarray(laplace(jnp.asarray(x)))

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    k = torch.from_numpy(laplacian_kernel_2d(3)).view(1, 1, 3, 3).repeat(3, 1, 1, 1)
    ref = F.conv2d(F.pad(xt, (1, 1, 1, 1)), k, groups=3).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_blur_vs_torch(np_rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = np_rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    got = np.asarray(blur(jnp.asarray(x)))

    # reference Blur semantics: ImageNet-normalise, reflect-pad 7, depthwise 15x15
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    xn = (x - mean) / std
    xt = torch.from_numpy(xn.transpose(0, 3, 1, 2))
    xt = F.pad(xt, (7, 7, 7, 7), mode="reflect")
    k = torch.from_numpy(isotropic_gaussian_kernel(15, 3.0)).view(1, 1, 15, 15)
    b, c, h, w = xt.shape
    ref = F.conv2d(xt.reshape(b * c, 1, h, w), k).reshape(b, c, h - 14, w - 14)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_frequency_fuse_shape(np_rng):
    x = jnp.asarray(np_rng.uniform(0, 1, (2, 24, 24, 3)).astype(np.float32))
    fused = frequency_fuse(x)
    assert fused.shape == (2, 24, 24, 9)
    # RGB passthrough in channels 0-2
    np.testing.assert_allclose(np.asarray(fused[..., :3]), np.asarray(x))
