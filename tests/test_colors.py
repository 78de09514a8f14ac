"""Colour conversion round-trip and reference-value tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from fdgan_tpu.ops import colors


@pytest.fixture
def img(np_rng):
    return jnp.asarray(np_rng.uniform(0.05, 0.95, (2, 8, 8, 3)).astype(np.float32))


@pytest.mark.parametrize("space", ["yuv", "ycbcr", "xyz", "lab", "hsv"])
def test_roundtrip(img, space):
    fwd = getattr(colors, f"rgb2{space}")
    bwd = getattr(colors, f"{space}2rgb")
    back = bwd(fwd(img))
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=2e-3)


def test_yuv_reference_values():
    # pure red
    red = jnp.asarray([[[[1.0, 0.0, 0.0]]]])
    yuv = np.asarray(colors.rgb2yuv(red))[0, 0, 0]
    assert yuv[0] == pytest.approx(0.299, abs=1e-5)


def test_lab_white_point():
    white = jnp.asarray([[[[1.0, 1.0, 1.0]]]])
    lab = np.asarray(colors.rgb2lab(white))[0, 0, 0]
    assert lab[0] == pytest.approx(100.0, abs=0.1)
    assert abs(lab[1]) < 0.5 and abs(lab[2]) < 0.5


def test_hsv_primary():
    green = jnp.asarray([[[[0.0, 1.0, 0.0]]]])
    hsv = np.asarray(colors.rgb2hsv(green))[0, 0, 0]
    assert hsv[0] == pytest.approx(1 / 3, abs=1e-5)
    assert hsv[1] == pytest.approx(1.0)
    assert hsv[2] == pytest.approx(1.0)


def test_hed_roundtrip(img):
    # rgb->hed->rgb is exact under the log-adjusted semantics for inputs
    # whose stain decomposition is non-negative; use a stain-like image
    stains = jnp.asarray([[[[0.3, 0.1, 0.2], [0.0, 0.5, 0.1]]]])
    rgb = colors.hed2rgb(stains)
    back = colors.rgb2hed(rgb)
    np.testing.assert_allclose(np.asarray(back), np.asarray(stains), atol=1e-5)


def test_hed_reference_values():
    # white (no stain) -> zero concentrations; pure haematoxylin column of
    # the Ruifrok-Johnston matrix reconstructs through hed2rgb
    white = jnp.ones((1, 1, 1, 3))
    hed = np.asarray(colors.rgb2hed(white))[0, 0, 0]
    np.testing.assert_allclose(hed, 0.0, atol=1e-6)
    h_only = jnp.asarray([[[[1.0, 0.0, 0.0]]]])
    rgb = np.asarray(colors.hed2rgb(h_only))[0, 0, 0]
    expected = np.exp(-np.array([0.65, 0.70, 0.29]) * -np.log(1e-6))
    np.testing.assert_allclose(rgb, expected, rtol=1e-5)


def test_convert_dispatcher(img):
    via = colors.convert(img, "rgb", "lab")
    direct = colors.rgb2lab(img)
    np.testing.assert_allclose(np.asarray(via), np.asarray(direct))
    same = colors.convert(img, "rgb", "rgb")
    np.testing.assert_allclose(np.asarray(same), np.asarray(img))
    with pytest.raises(ValueError):
        colors.convert(img, "rgb", "nope")
