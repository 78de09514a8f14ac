"""fdgan_fast must be numerically identical (fp tolerance) to fdgan.apply in
both BN modes."""

import numpy as np

import jax
import jax.numpy as jnp

from fdgan_tpu.models import fdgan, fdgan_fast


def test_fast_matches_reference_batch(rng, np_rng):
    params = fdgan.init(rng)
    x = jnp.asarray(np_rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    ref = np.asarray(fdgan.apply(params, x, bn_mode="batch"))
    got = np.asarray(fdgan_fast.apply(params, x, bn_mode="batch"))
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


def test_fast_matches_reference_running(rng, np_rng):
    params = fdgan.init(rng)
    # perturb running stats so the mode is distinguishable
    def bump(d, key):
        for k, v in d.items():
            if isinstance(v, dict):
                bump(v, key)
            elif k == "mean":
                d[k] = v + 0.05
            elif k == "var":
                d[k] = v * 1.1
    bump(params, None)
    x = jnp.asarray(np_rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    ref = np.asarray(fdgan.apply(params, x, bn_mode="running"))
    got = np.asarray(fdgan_fast.apply(params, x, bn_mode="running"))
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


def test_fast_stats_capture_matches_base(rng, np_rng):
    """Per-BN batch statistics captured by the fast forward equal the base
    path's captured statistics (paths and values) — the train step's
    running-stat folding relies on this."""
    params = fdgan.init(rng)
    x = jnp.asarray(np_rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))

    base_stats: dict = {}
    fdgan.apply(params, x, bn_mode="batch", stats_out=base_stats)
    fast_stats: dict = {}
    fdgan_fast.apply(params, x, bn_mode="batch", stats_out=fast_stats)

    assert set(fast_stats.keys()) == set(base_stats.keys())
    for k in base_stats:
        for a, b in zip(base_stats[k], fast_stats[k]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4, err_msg=k)


def test_structured_remat_identical(rng):
    """remat=True (per-layer/per-stage jax.checkpoint) must be value- and
    gradient-identical to the plain forward; only the backward schedule
    differs."""
    import jax
    import jax.numpy as jnp

    from fdgan_tpu.models import fdgan, fdgan_fast

    params = fdgan.init(rng)
    x = jax.random.uniform(jax.random.PRNGKey(7), (2, 32, 32, 3))

    for mode in ("batch", "running"):
        def run(p, v, remat):
            s = {}
            y = fdgan_fast.apply(p, v, bn_mode=mode, stats_out=s, remat=remat)
            return y, s

        y0, s0 = jax.jit(lambda p, v: run(p, v, False))(params, x)
        for level in (True, "stages"):
            y1, s1 = jax.jit(lambda p, v: run(p, v, level))(params, x)
            np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
            assert sorted(s0) == sorted(s1)
            for k in s0:
                for a, b in zip(s0[k], s1[k]):
                    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def loss(p, v, remat):
        return jnp.sum(jnp.abs(fdgan_fast.apply(p, v, stats_out={}, remat=remat)))

    g0 = jax.jit(jax.grad(lambda p, v: loss(p, v, False)))(params, x)
    g1 = jax.jit(jax.grad(lambda p, v: loss(p, v, True)))(params, x)
    leaves0 = jax.tree_util.tree_leaves(g0)
    leaves1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)
