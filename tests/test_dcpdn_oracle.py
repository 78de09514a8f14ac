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
