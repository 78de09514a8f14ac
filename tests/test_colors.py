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


def test_convert_dispatcher(img):
    via = colors.convert(img, "rgb", "lab")
    direct = colors.rgb2lab(img)
    np.testing.assert_allclose(np.asarray(via), np.asarray(direct))
    same = colors.convert(img, "rgb", "rgb")
    np.testing.assert_allclose(np.asarray(same), np.asarray(img))
    with pytest.raises(ValueError):
        colors.convert(img, "rgb", "nope")
