"""Full-graph parity of the DCPDN Dense2 transmission generator against a
torch oracle through the importer (legacy-family analog of test_fdgan's
flagship check)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fdgan_tpu.io.torch_import import convert_state_dict
from fdgan_tpu.models import dcpdn

torch = pytest.importorskip("torch")
from torch_oracle import Dense2Oracle  # noqa: E402


def test_dense2_parity(rng, np_rng):
    torch.manual_seed(0)
    oracle = Dense2Oracle()
    oracle.train()  # batch-stats BN, reference inference mode

    state = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = convert_state_dict(state, dcpdn.dense_g_init(rng, pyramid=True))

    x = np_rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(dcpdn.dense_g_apply(params, jnp.asarray(x), pyramid=True))
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


from torch_oracle import reference_key_names as _reference_key_names  # noqa: E402


def test_dense_parity(rng, np_rng):
    """dehaze1113.Dense — the no-pyramid variant with the live batchnorm20
    tail and dead conv1010-1040/batchnorm1 (r3: previously only Dense2 had
    an oracle)."""
    from torch_oracle import DenseOracle

    torch.manual_seed(5)
    oracle = DenseOracle()
    oracle.train()
    state = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = convert_state_dict(state, dcpdn.dense_g_init(rng, pyramid=False))
    x = np_rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(dcpdn.dense_g_apply(params, jnp.asarray(x), pyramid=False))
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def _torch_forward(oracle, x):
    """oracle.train() for batch-stats BN (reference inference mode) but with
    every Dropout disabled — the deterministic comparison mode."""
    oracle.train()
    for m in oracle.modules():
        if isinstance(m, torch.nn.Dropout2d):
            m.eval()
    with torch.no_grad():
        y = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    return y


def test_unet_g_parity(rng, np_rng):
    """dehaze22.G through the importer with the REAL reference key naming
    (doubled blockUNet segments) and the forced-transposed layout map —
    dlayer8's equal-in/out ConvTranspose is layout-ambiguous by shape alone
    (io/torch_import.UNET_TRANSPOSED)."""
    from fdgan_tpu.io.torch_import import UNET_TRANSPOSED
    from torch_oracle import UNetGOracle

    torch.manual_seed(1)
    oracle = UNetGOracle(nf=8)
    state = _reference_key_names(
        {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    )
    params = convert_state_dict(
        state, dcpdn.unet_g_init(rng, nf=8), transposed=UNET_TRANSPOSED
    )
    x = np_rng.uniform(0, 1, (2, 256, 256, 3)).astype(np.float32)
    ref = _torch_forward(oracle, x).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(dcpdn.unet_g_apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def test_unet_g2_parity(rng, np_rng):
    from fdgan_tpu.io.torch_import import UNET_TRANSPOSED
    from torch_oracle import UNetG2Oracle

    torch.manual_seed(2)
    oracle = UNetG2Oracle(nf=8)
    state = _reference_key_names(
        {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    )
    params = convert_state_dict(
        state, dcpdn.unet_g2_init(rng, nf=8), transposed=UNET_TRANSPOSED
    )
    x = np_rng.uniform(0, 1, (2, 256, 256, 3)).astype(np.float32)
    ref = _torch_forward(oracle, x).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(dcpdn.unet_g2_apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def test_dehaze_physical_parity(rng, np_rng):
    """Full dehaze22.dehaze composite (J=(I−A)/t+A) against its oracle —
    the last legacy model family without a numeric oracle (VERDICT r2
    pattern: every lost-source/legacy graph gets one)."""
    from fdgan_tpu.io.torch_import import DEHAZE_TRANSPOSED
    from torch_oracle import DehazeOracle

    torch.manual_seed(3)
    oracle = DehazeOracle()
    # The J=(I−A)/t+A composition divides by |tran|+1e-10; with RANDOM
    # weights the transmission tanh crosses 0 (|tran| down to ~1e-7),
    # making the quotient arbitrarily ill-conditioned — a 1e-4 fp
    # difference in tran amplifies unboundedly AND contaminates every
    # output pixel through the refine convs / global pyramid pools.  A
    # *trained* transmission is bounded away from 0 by construction; make
    # the random one so too (in BOTH frameworks, via the shared state
    # dict) by biasing the transmission head: tanh(pre+4) ≥ ~0.75.
    with torch.no_grad():
        oracle.tran_dense.refine3.bias += 4.0
    state = _reference_key_names(
        {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    )
    params = convert_state_dict(
        state, dcpdn.dehaze_physical_init(rng), transposed=DEHAZE_TRANSPOSED
    )
    x = np_rng.uniform(0.2, 0.8, (2, 256, 256, 3)).astype(np.float32)
    refs = [r.numpy().transpose(0, 2, 3, 1) for r in _torch_forward(oracle, x)]
    gots = [np.asarray(g) for g in dcpdn.dehaze_physical_apply(params, jnp.asarray(x))]
    assert float(np.abs(refs[1]).min()) > 0.5  # conditioning floor holds
    for name, ref, got in zip(("dehaze", "tran", "atp", "dehaze2"), refs, gots):
        np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-2, err_msg=name)
