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


def test_pallas_h_slab_tiling(np_rng):
    """tile_h splits planes into overlapping H-slabs (the >1024² path);
    results match the untiled kernel exactly, including a ragged last slab."""
    x = jnp.asarray(np_rng.uniform(0, 1, (1, 40, 24, 3)).astype(np.float32))
    ref = np.asarray(frequency_fuse_pallas(x, interpret=True))
    for tile_h in (16, 13):  # even split and ragged (40 = 3*13 + 1)
        got = np.asarray(frequency_fuse_pallas(x, interpret=True, tile_h=tile_h))
        np.testing.assert_allclose(got, ref, atol=1e-6)
