"""SSIM parity tests: differentiable SSIM vs a torch re-execution of the
reference algorithm, and the eval-protocol compare_ssim vs its definition."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fdgan_tpu.ops.metrics import compare_ssim, mssim_channels, psnr
from fdgan_tpu.ops.ssim import gaussian_window_1d, ssim


def _torch_ssim(img1, img2, window_size=11):
    """Direct torch port of pytorch_ssim._ssim (reference :17-37) used only
    as a test oracle."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    t1 = torch.from_numpy(img1.transpose(0, 3, 1, 2))
    t2 = torch.from_numpy(img2.transpose(0, 3, 1, 2))
    channel = t1.shape[1]
    w1d = torch.from_numpy(gaussian_window_1d(window_size, 1.5)).unsqueeze(1)
    w2d = w1d.mm(w1d.t()).float().unsqueeze(0).unsqueeze(0)
    window = w2d.expand(channel, 1, window_size, window_size).contiguous()
    pad = window_size // 2
    mu1 = F.conv2d(t1, window, padding=pad, groups=channel)
    mu2 = F.conv2d(t2, window, padding=pad, groups=channel)
    mu1_sq, mu2_sq, mu1_mu2 = mu1.pow(2), mu2.pow(2), mu1 * mu2
    s1 = F.conv2d(t1 * t1, window, padding=pad, groups=channel) - mu1_sq
    s2 = F.conv2d(t2 * t2, window, padding=pad, groups=channel) - mu2_sq
    s12 = F.conv2d(t1 * t2, window, padding=pad, groups=channel) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    m = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return float(m.mean())


def test_ssim_identical_images(np_rng):
    x = jnp.asarray(np_rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)


def test_ssim_vs_torch_oracle(np_rng):
    a = np_rng.uniform(0, 1, (2, 24, 24, 3)).astype(np.float32)
    b = np.clip(a + 0.1 * np_rng.standard_normal(a.shape).astype(np.float32), 0, 1)
    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    # torch oracle convolves without the padding='SAME' edge renormalisation
    # difference — both use zero padding, so means match exactly
    ref = _torch_ssim(a, b)
    assert got == pytest.approx(ref, abs=2e-5)


def test_ssim_differentiable(np_rng):
    a = jnp.asarray(np_rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    b = jnp.asarray(np_rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    g = jax.grad(lambda x: ssim(x, b))(a)
    assert np.isfinite(np.asarray(g)).all()


def test_psnr_protocol():
    a = np.zeros((8, 8, 3))
    b = np.full((8, 8, 3), 0.1)
    assert psnr(a, b) == pytest.approx(10 * np.log10(1 / 0.01), abs=1e-6)


def test_compare_ssim_properties(np_rng):
    x = (np_rng.uniform(0, 1, (32, 32)) * 255).astype(np.uint8)
    assert compare_ssim(x, x, gaussian_weights=True, use_sample_covariance=False) == pytest.approx(1.0)
    y = 255 - x
    assert compare_ssim(x, y, gaussian_weights=True, use_sample_covariance=False) < 0.5


def test_mssim_channels(np_rng):
    x = (np_rng.uniform(0, 1, (32, 32, 3)) * 255).astype(np.uint8)
    noise = np_rng.integers(-20, 20, x.shape)
    y = np.clip(x.astype(int) + noise, 0, 255).astype(np.uint8)
    v = mssim_channels(x, y)
    assert 0 < v < 1
