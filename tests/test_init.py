"""dcgan_init tests: determinism (stable crc32 path keying), DCGAN
distribution (misc.py:16-22 parity), running stats preserved, CLI wiring."""

import numpy as np

import jax
import jax.numpy as jnp

from fdgan_tpu.models import fdgan
from fdgan_tpu.models.discriminators import nlayer_init
from fdgan_tpu.nn.init import DENSENET_PRETRAINED_KEYS, dcgan_init


def _leaves_with_paths(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _leaves_with_paths(v, path + (k,))
    else:
        yield path, tree


def test_dcgan_init_deterministic(rng):
    """Same seed → bit-identical params (crc32 path keys, not Python hash)."""
    params = nlayer_init(jax.random.fold_in(rng, 7), input_nc=9)
    a = dcgan_init(rng, params)
    b = dcgan_init(rng, params)
    for (pa, la), (pb, lb) in zip(_leaves_with_paths(a), _leaves_with_paths(b)):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_dcgan_init_distribution(rng):
    """Conv kernels ~ N(0, .02); BN scale ~ N(1, .02), bias 0; stats kept."""
    params = fdgan.init(rng)
    out = dcgan_init(jax.random.fold_in(rng, 1), params)

    kernels, scales, biases = [], [], []
    stats_before, stats_after = [], []
    for (path, leaf), (_, before) in zip(
        _leaves_with_paths(out), _leaves_with_paths(params)
    ):
        if path[-1] == "kernel":
            kernels.append(np.asarray(leaf).ravel())
        elif path[-1] == "scale":
            scales.append(np.asarray(leaf).ravel())
        elif path[-1] == "bias":
            biases.append(np.asarray(leaf).ravel())
        elif path[-1] in ("mean", "var"):
            stats_before.append(np.asarray(before))
            stats_after.append(np.asarray(leaf))

    k = np.concatenate(kernels)
    s = np.concatenate(scales)
    assert abs(k.mean()) < 2e-3 and abs(k.std() - 0.02) < 2e-3
    assert abs(s.mean() - 1.0) < 2e-3 and abs(s.std() - 0.02) < 2e-3
    assert all((b == 0).all() for b in biases)
    for before, after in zip(stats_before, stats_after):
        np.testing.assert_array_equal(before, after)


def test_dcgan_init_paths_decorrelated(rng):
    """Different layers draw from different keys (path folding works)."""
    params = fdgan.init(rng)
    out = dcgan_init(jax.random.fold_in(rng, 2), params)
    kernels = [
        np.asarray(leaf)
        for path, leaf in _leaves_with_paths(out)
        if path[-1] == "kernel"
    ]
    # two same-shape kernels from different paths must differ
    same_shape = {}
    found_pair = False
    for k in kernels:
        key = k.shape
        if key in same_shape:
            assert not np.array_equal(k, same_shape[key])
            found_pair = True
        same_shape[key] = k
    # the dense blocks have many repeated-shape convs, so the check must fire
    assert found_pair


def test_dcgan_init_skips_pretrained_backbone(rng):
    """With skip=DENSENET_PRETRAINED_KEYS the pretrained encoder subtrees
    are bit-identical while the fresh decoder/refinement layers are
    re-drawn (the reference's weights_init never touches the pretrained
    densenet121 weights, dehaze1113.py:707-728)."""
    params = fdgan.init(rng)
    out = dcgan_init(jax.random.fold_in(rng, 3), params, skip=DENSENET_PRETRAINED_KEYS)
    for key in DENSENET_PRETRAINED_KEYS:
        for (pa, la), (pb, lb) in zip(
            _leaves_with_paths(params[key]), _leaves_with_paths(out[key])
        ):
            assert pa == pb
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    # a fresh layer did get re-drawn
    assert not np.array_equal(
        np.asarray(params["conv_refin3"]["kernel"]),
        np.asarray(out["conv_refin3"]["kernel"]),
    )
