"""FDGAN generator tests: shapes, jit-ability, and full-graph parity against
the torch oracle through the checkpoint importer (the golden-path test for
SURVEY.md §7.3 hard part #1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fdgan_tpu.io.torch_import import FDGAN_TRANSPOSED, convert_state_dict, export_state_dict
from fdgan_tpu.models import fdgan
from fdgan_tpu.nn.tree import tree_size


def test_forward_shapes(rng):
    params = fdgan.init(rng)
    x = jnp.zeros((1, 64, 64, 3))
    y = fdgan.apply(params, x)
    assert y.shape == (1, 64, 64, 3)
    # non-square, both divisible by 8
    y2 = fdgan.apply(params, jnp.zeros((2, 64, 96, 3)))
    assert y2.shape == (2, 64, 96, 3)


def test_output_range(rng, np_rng):
    params = fdgan.init(rng)
    x = jnp.asarray(np_rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    y = np.asarray(fdgan.apply(params, x))
    assert (y >= -1).all() and (y <= 1).all()


def test_param_tree_structure(rng):
    params = fdgan.init(rng)
    # live modules
    for k in [
        "dense_block1", "trans_block1", "dense_block2", "trans_block2",
        "dense_block3", "trans_block3", "dense_block4", "trans_block4",
        "dense_block5", "trans_block5", "dense_block6", "trans_block6",
        "conv_refin1", "conv_refin2", "conv_refin3", "conv_refin5",
        "conv_refin6", "conv_refine4",
    ]:
        assert k in params, k
    # dead params carried for checkpoint parity (SURVEY.md §2.2)
    assert "conv0" in params
    assert "dense_block31" in params and len(params["dense_block31"]) == 16
    assert "dense_norm31" in params
    assert params["dense_block1"]["denselayer1"]["conv1"]["kernel"].shape == (1, 1, 64, 128)


def test_jit_compiles_once(rng):
    params = fdgan.init(rng)
    calls = 0

    @jax.jit
    def fwd(p, x):
        nonlocal calls
        calls += 1
        return fdgan.apply(p, x)

    x = jnp.zeros((1, 32, 32, 3))
    fwd(params, x).block_until_ready()
    fwd(params, x).block_until_ready()
    assert calls == 1


def test_parity_vs_torch_oracle(rng, np_rng):
    """Random torch weights → state dict → importer → identical outputs."""
    torch = pytest.importorskip("torch")
    from torch_oracle import FDGANOracle

    torch.manual_seed(0)
    oracle = FDGANOracle()
    oracle.train()  # reference inference mode: batch-stats BN (README.md:38)

    state = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    target = fdgan.init(rng)
    params = convert_state_dict(state, target)

    x = np_rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(fdgan.apply(params, jnp.asarray(x), bn_mode="batch"))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_export_roundtrip(rng):
    """pytree → torch-layout state dict → pytree is the identity."""
    params = fdgan.init(rng)
    state = export_state_dict(params, transposed=FDGAN_TRANSPOSED)
    back = convert_state_dict(state, fdgan.init(jax.random.PRNGKey(1)))
    leaves1 = jax.tree.leaves(params)
    leaves2 = jax.tree.leaves(back)
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # ~11M params like the reference generator
    assert 8e6 < tree_size(params) < 30e6
