"""VGG16 feature-extractor parity vs a torch oracle built from the spec
(myutils/vgg16.py:6-49), through the state-dict importer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fdgan_tpu.io.torch_import import convert_state_dict
from fdgan_tpu.models import vgg16

torch = pytest.importorskip("torch")


def _torch_vgg():
    import torch.nn as nn

    class Vgg16Oracle(nn.Module):
        def __init__(self):
            super().__init__()
            cfg = [
                ("conv1_1", 3, 64), ("conv1_2", 64, 64),
                ("conv2_1", 64, 128), ("conv2_2", 128, 128),
                ("conv3_1", 128, 256), ("conv3_2", 256, 256), ("conv3_3", 256, 256),
                ("conv4_1", 256, 512), ("conv4_2", 512, 512), ("conv4_3", 512, 512),
                ("conv5_1", 512, 512), ("conv5_2", 512, 512), ("conv5_3", 512, 512),
            ]
            for name, cin, cout in cfg:
                setattr(self, name, nn.Conv2d(cin, cout, 3, padding=1))

        def forward(self, x):
            import torch.nn.functional as F

            h = F.relu(self.conv1_1(x))
            h = F.relu(self.conv1_2(h))
            r12 = h
            h = F.max_pool2d(h, 2, 2)
            h = F.relu(self.conv2_1(h))
            h = F.relu(self.conv2_2(h))
            r22 = h
            h = F.max_pool2d(h, 2, 2)
            h = F.relu(self.conv3_1(h))
            h = F.relu(self.conv3_2(h))
            h = F.relu(self.conv3_3(h))
            r33 = h
            h = F.max_pool2d(h, 2, 2)
            h = F.relu(self.conv4_1(h))
            h = F.relu(self.conv4_2(h))
            h = F.relu(self.conv4_3(h))
            return [r12, r22, r33, h]

    return Vgg16Oracle()


def test_vgg_features_match_torch(rng, np_rng):
    torch.manual_seed(0)
    oracle = _torch_vgg()
    state = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = convert_state_dict(state, vgg16.init(rng))

    x = np_rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        refs = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    feats = vgg16.apply(params, jnp.asarray(x))
    assert len(feats) == 4
    for got, ref in zip(feats, refs):
        np.testing.assert_allclose(
            np.asarray(got), ref.numpy().transpose(0, 2, 3, 1), atol=5e-4, rtol=1e-3
        )


def test_gram_matrix_vs_torch(np_rng):
    y = np_rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    got = np.asarray(vgg16.gram_matrix(jnp.asarray(y)))
    t = torch.from_numpy(y.transpose(0, 3, 1, 2))
    b, ch, h, w = t.shape
    feats = t.view(b, ch, w * h)
    ref = (feats.bmm(feats.transpose(1, 2)) / (ch * h * w)).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-5)
