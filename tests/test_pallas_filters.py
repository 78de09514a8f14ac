"""Pallas fused frequency kernel vs the XLA reference path (interpreter mode
on CPU — same kernel code the TPU compiles)."""

import numpy as np

import jax.numpy as jnp

from fdgan_tpu.ops.filters import frequency_fuse
from fdgan_tpu.ops.pallas_filters import frequency_fuse_pallas


def test_pallas_matches_xla(np_rng):
    x = jnp.asarray(np_rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    ref = np.asarray(frequency_fuse(x))
    got = np.asarray(frequency_fuse_pallas(x, interpret=True))
    assert got.shape == ref.shape == (2, 32, 32, 9)
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_pallas_non_square(np_rng):
    x = jnp.asarray(np_rng.uniform(0, 1, (1, 24, 40, 3)).astype(np.float32))
    ref = np.asarray(frequency_fuse(x))
    got = np.asarray(frequency_fuse_pallas(x, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-4)
