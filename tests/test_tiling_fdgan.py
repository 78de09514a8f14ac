"""Halo-tiled FDGAN inference: tiled output must match untiled within a small
tolerance in running-BN mode (batch-BN couples pixels globally — documented
delta, see dist/tiling.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from fdgan_tpu.dist.tiling import tiled_apply
from fdgan_tpu.models import fdgan


def test_tiled_fdgan_matches_untiled_running_bn(rng, np_rng):
    params = fdgan.init(rng)
    # give running stats sane values so 'running' mode is well-scaled
    x = jnp.asarray(np_rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))

    fn = jax.jit(lambda t: fdgan.apply(params, t, bn_mode="running"))
    ref = np.asarray(fn(x))
    got = np.asarray(tiled_apply(fn, x, tile=48, halo=16))
    assert got.shape == ref.shape
    # interior tolerance: halo 16 at 64px is below the theoretical receptive
    # field, so compare medians of the error rather than exact equality
    err = np.abs(got - ref)
    assert np.median(err) < 1e-3
    assert err.mean() < 5e-3
