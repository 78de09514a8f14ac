"""Torch test oracle for FDGAN parity checks.

A minimal torch.nn mirror of the reference generator's module graph
(models/dehaze1113.py:702-801) built from the *specification* (SURVEY.md
§2.2) — torchvision is unavailable here, so the densenet121 blocks are
reconstructed with torchvision's state-dict naming (denselayerN.norm1/conv1/
norm2/conv2, transition norm/conv). Used only by tests: random torch weights
are exported to a state dict, converted through fdgan_tpu.io.torch_import,
and outputs are compared bit-for-bit (within fp tolerance).
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class _DenseLayer(nn.Module):
    def __init__(self, in_ch, growth=32, bn_size=4):
        super().__init__()
        self.norm1 = nn.BatchNorm2d(in_ch)
        self.conv1 = nn.Conv2d(in_ch, bn_size * growth, 1, bias=False)
        self.norm2 = nn.BatchNorm2d(bn_size * growth)
        self.conv2 = nn.Conv2d(bn_size * growth, growth, 3, padding=1, bias=False)

    def forward(self, x):
        h = self.conv1(F.relu(self.norm1(x)))
        h = self.conv2(F.relu(self.norm2(h)))
        return torch.cat([x, h], 1)


class _DenseBlock(nn.Module):
    def __init__(self, in_ch, num_layers):
        super().__init__()
        for i in range(num_layers):
            self.add_module(f"denselayer{i + 1}", _DenseLayer(in_ch + i * 32))

    def forward(self, x):
        for layer in self.children():
            x = layer(x)
        return x


class _Transition(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.norm = nn.BatchNorm2d(in_ch)
        self.conv = nn.Conv2d(in_ch, out_ch, 1, bias=False)

    def forward(self, x):
        return F.avg_pool2d(self.conv(F.relu(self.norm(x))), 2)


class _BottleneckDy(nn.Module):
    """BottleneckBlockdy: BN params exist but are dead (dehaze1113.py:256-275)."""

    def __init__(self, in_p, out_p):
        super().__init__()
        inter = out_p * 4
        self.bn1 = nn.BatchNorm2d(in_p)
        self.conv1 = nn.Conv2d(in_p, inter, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(inter)
        self.conv2 = nn.Conv2d(inter, out_p, 3, padding=1, bias=False)

    def forward(self, x):
        out = self.conv1(F.relu(x))
        out = self.conv2(F.relu(out))
        return torch.cat([x, out], 1)


class _TransitionDy(nn.Module):
    """TransitionBlockdy: dead BN + 1×1 ConvTranspose + ×2 nearest up."""

    def __init__(self, in_p, out_p):
        super().__init__()
        self.bn1 = nn.BatchNorm2d(in_p)
        self.conv1 = nn.ConvTranspose2d(in_p, out_p, 1, bias=False)

    def forward(self, x):
        return F.interpolate(self.conv1(F.relu(x)), scale_factor=2, mode="nearest")


class FDGANOracle(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv0 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)  # dead
        self.dense_block1 = _DenseBlock(64, 6)
        self.trans_block1 = _Transition(256, 128)
        self.dense_block2 = _DenseBlock(128, 12)
        self.trans_block2 = _Transition(512, 256)
        self.dense_block3 = _DenseBlock(256, 24)
        self.trans_block3 = _Transition(1024, 512)
        self.dense_block31 = _DenseBlock(512, 16)  # dead
        self.dense_norm31 = nn.BatchNorm2d(1024)  # dead
        self.dense_block4 = _BottleneckDy(512, 256)
        self.trans_block4 = _TransitionDy(768, 128)
        self.dense_block5 = _BottleneckDy(384, 128)
        self.trans_block5 = _TransitionDy(512, 64)
        self.dense_block6 = _BottleneckDy(64, 32)
        self.trans_block6 = _TransitionDy(96, 16)
        self.conv_refin1 = nn.Conv2d(3, 64, 3, 1, 1)
        self.conv_refin6 = nn.Conv2d(640, 512, 3, 1, 1)
        self.conv_refin5 = nn.Conv2d(256, 128, 1, 1, 0)
        self.conv_refin3 = nn.Conv2d(16, 3, 3, 1, 1)
        self.conv_refin2 = nn.Conv2d(64, 32, 1, 1, 0)
        self.conv_refine4 = nn.Conv2d(160, 128, 3, 1, 1)

    def forward(self, x):
        x0 = F.relu(self.conv_refin1(x))
        x01 = self.conv_refin2(F.avg_pool2d(x0, 2))
        x1 = self.trans_block1(self.dense_block1(x0))
        x10 = self.conv_refine4(torch.cat([x01, x1], 1))
        x2 = self.trans_block2(self.dense_block2(x10))
        x3 = self.trans_block3(self.dense_block3(x2))
        x22 = self.conv_refin5(F.avg_pool2d(x2, 2))
        x4 = self.trans_block4(self.dense_block4(self.conv_refin6(torch.cat([x3, x22], 1))))
        x42 = torch.cat([x4, x2], 1)
        x5 = self.trans_block5(self.dense_block5(x42))
        x6 = self.trans_block6(self.dense_block6(x5))
        return torch.tanh(self.conv_refin3(x6))


class ContextualLossOracle(nn.Module):
    """Torch mirror of the reference's orphaned ``ContextualLoss``
    (loss.cpython-36.pyc lines 23-73, semantics recovered in SURVEY.md §2.9
    #20), structured as the pyc's four helpers. Defaults sigma=0.1, b=1.0,
    epsilon=1e-5, similarity='cos'. Inputs are NCHW feature maps (torch
    convention); each spatial position is a C-vector."""

    def __init__(self, sigma=0.1, b=1.0, epsilon=1e-5):
        super().__init__()
        self.sigma, self.b, self.epsilon = sigma, b, epsilon

    @staticmethod
    def _cos_distance(i_feat, t_feat):
        # pyc 31-44: mean-centre BOTH sets by the target's per-sample channel
        # mean, L2-normalise, d = 1 − ⟨î, t̂⟩
        t_mean = t_feat.mean(dim=1, keepdim=True)
        i_cent = i_feat - t_mean
        t_cent = t_feat - t_mean
        i_hat = i_cent / (i_cent.norm(dim=-1, keepdim=True) + 1e-12)
        t_hat = t_cent / (t_cent.norm(dim=-1, keepdim=True) + 1e-12)
        return 1.0 - torch.bmm(i_hat, t_hat.transpose(1, 2))

    def _relative_distances(self, d):
        # pyc 49-51: d̃ = d / (min over target positions + ε)
        d_min, _ = d.min(dim=2, keepdim=True)
        return d / (d_min + self.epsilon)

    def _weighted_average_distances(self, d_tilde):
        # pyc 53-57: w = exp((b − d̃)/σ), normalised over target positions
        w = torch.exp((self.b - d_tilde) / self.sigma)
        return w / w.sum(dim=2, keepdim=True)

    def forward(self, image_features, target_features):
        B, C, H, W = image_features.shape
        i_feat = image_features.reshape(B, C, H * W).transpose(1, 2).float()
        t_feat = target_features.reshape(B, C, H * W).transpose(1, 2).float()
        d = self._cos_distance(i_feat, t_feat)
        cx_ij = self._weighted_average_distances(self._relative_distances(d))
        # pyc 59-68: per target position take the best image position,
        # CX = −log(mean over target positions), averaged over the batch
        cx, _ = cx_ij.max(dim=1)
        return (-torch.log(cx.mean(dim=1) + 1e-12)).mean()


class _Bottleneck(nn.Module):
    """BottleneckBlock with live BNs (dehaze1113.py:234-253)."""

    def __init__(self, in_p, out_p):
        super().__init__()
        inter = out_p * 4
        self.bn1 = nn.BatchNorm2d(in_p)
        self.conv1 = nn.Conv2d(in_p, inter, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(inter)
        self.conv2 = nn.Conv2d(inter, out_p, 3, padding=1, bias=False)

    def forward(self, x):
        out = self.conv1(F.relu(self.bn1(x)))
        out = self.conv2(F.relu(self.bn2(out)))
        return torch.cat([x, out], 1)


class _TransitionUp(nn.Module):
    """TransitionBlock: BN + 1x1 ConvTranspose + x2 nearest (dehaze1113.py:343-355)."""

    def __init__(self, in_p, out_p):
        super().__init__()
        self.bn1 = nn.BatchNorm2d(in_p)
        self.conv1 = nn.ConvTranspose2d(in_p, out_p, 1, bias=False)

    def forward(self, x):
        return F.interpolate(self.conv1(F.relu(self.bn1(x))), scale_factor=2, mode="nearest")


class Dense2Oracle(nn.Module):
    """dehaze1113.Dense2 / dehaze22.Dense (pyramid variant, :572-699)."""

    def __init__(self):
        super().__init__()
        self.conv0 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.norm0 = nn.BatchNorm2d(64)
        self.dense_block1 = _DenseBlock(64, 6)
        self.trans_block1 = _Transition(256, 128)
        self.dense_block2 = _DenseBlock(128, 12)
        self.trans_block2 = _Transition(512, 256)
        self.dense_block3 = _DenseBlock(256, 24)
        self.trans_block3 = _Transition(1024, 512)
        self.dense_block4 = _Bottleneck(512, 256)
        self.trans_block4 = _TransitionUp(768, 128)
        self.dense_block5 = _Bottleneck(384, 256)
        self.trans_block5 = _TransitionUp(640, 128)
        self.dense_block6 = _Bottleneck(256, 128)
        self.trans_block6 = _TransitionUp(384, 64)
        self.dense_block7 = _Bottleneck(64, 64)
        self.trans_block7 = _TransitionUp(128, 32)
        self.dense_block8 = _Bottleneck(32, 32)
        self.trans_block8 = _TransitionUp(64, 16)
        self.conv_refin = nn.Conv2d(19, 20, 3, 1, 1)
        for name in ("conv1010", "conv1020", "conv1030", "conv1040"):
            setattr(self, name, nn.Conv2d(20, 1, 1))
        self.refine3 = nn.Conv2d(24, 3, 3, 1, 1)

    def _trunk(self, x):
        x0 = F.max_pool2d(F.relu(self.norm0(self.conv0(x))), 3, 2, 1)
        x1 = self.trans_block1(self.dense_block1(x0))
        x2 = self.trans_block2(self.dense_block2(x1))
        x3 = self.trans_block3(self.dense_block3(x2))
        x4 = self.trans_block4(self.dense_block4(x3))
        x42 = torch.cat([x4, x2], 1)
        x5 = self.trans_block5(self.dense_block5(x42))
        x52 = torch.cat([x5, x1], 1)
        x6 = self.trans_block6(self.dense_block6(x52))
        x7 = self.trans_block7(self.dense_block7(x6))
        x8 = self.trans_block8(self.dense_block8(x7))
        return torch.cat([x8, x], 1)

    def forward(self, x):
        x9 = F.leaky_relu(self.conv_refin(self._trunk(x)), 0.2)
        shape_out = x9.shape[2:4]
        outs = []
        for pool, name in ((32, "conv1010"), (16, "conv1020"), (8, "conv1030"), (4, "conv1040")):
            z = F.avg_pool2d(x9, pool)
            z = F.interpolate(F.leaky_relu(getattr(self, name)(z), 0.2), size=shape_out, mode="nearest")
            outs.append(z)
        dehaze = torch.cat(outs + [x9], 1)
        return torch.tanh(self.refine3(dehaze))


class DenseOracle(Dense2Oracle):
    """dehaze1113.Dense (:431-568, the no-pyramid 'batchnorm20' variant):
    tail = tanh(refine3(LeakyReLU(batchnorm20(conv_refin(x8))))); dead
    batchnorm1 and conv1010-1040 carried for checkpoint parity."""

    def __init__(self):
        super().__init__()
        self.refine3 = nn.Conv2d(20, 3, 3, 1, 1)  # 20→3 (no pyramid concat)
        self.batchnorm20 = nn.BatchNorm2d(20)
        self.batchnorm1 = nn.BatchNorm2d(1)  # dead (dehaze1113.py:497)

    def forward(self, x):
        x9 = F.leaky_relu(self.batchnorm20(self.conv_refin(self._trunk(x))), 0.2)
        return torch.tanh(self.refine3(x9))


def reference_key_names(state):
    """Rebuild the reference's REAL state-dict naming from an oracle's
    dedup'd one: blockUNet modules double their name segment
    (``dlayer8.tconv`` → ``dlayer8.dlayer8.tconv``, dehaze22.py:35-60 —
    torch ≥1.0 forbids dots in ``add_module`` names, so the oracles can't
    carry the dotted names natively). ``dlayerfinal.*`` and the pyramid
    convs keep their names."""
    out = {}
    for k, v in state.items():
        parts = k.split(".")
        for i, seg in enumerate(parts[:-1]):
            if (seg.startswith("layer") or seg.startswith("dlayer")) and seg != "dlayerfinal":
                if i + 1 < len(parts) and parts[i + 1] != seg and not (
                    i > 0 and parts[i - 1] == "dlayerfinal"
                ):
                    parts = parts[: i + 1] + [seg] + parts[i + 1 :]
                break
        out[".".join(parts)] = v
    return out


class _UNetDown(nn.Module):
    """blockUNet(transposed=False): LeakyReLU pre-act → 4×4 s2 conv → BN
    (dehaze22.py:52-60). Submodule names = the reference's dedup'd state
    keys (``layer2.layer2.conv`` → ``layer2.conv``)."""

    def __init__(self, in_c, out_c):
        super().__init__()
        self.conv = nn.Conv2d(in_c, out_c, 4, 2, 1, bias=False)
        self.bn = nn.BatchNorm2d(out_c)

    def forward(self, x):
        return self.bn(self.conv(F.leaky_relu(x, 0.2)))


class _UNetUp(nn.Module):
    """blockUNet(transposed=True): ReLU pre-act → 4×4 s2 ConvTranspose →
    optional BN → optional Dropout2d (dehaze22.py:52-60)."""

    def __init__(self, in_c, out_c, bn=True, dropout=False):
        super().__init__()
        self.tconv = nn.ConvTranspose2d(in_c, out_c, 4, 2, 1, bias=False)
        if bn:
            self.bn = nn.BatchNorm2d(out_c)
        self.drop = nn.Dropout2d(0.5) if dropout else None

    def forward(self, x):
        h = self.tconv(F.relu(x))
        if hasattr(self, "bn"):
            h = self.bn(h)
        if self.drop is not None:
            h = self.drop(h)
        return h


class _UNetUpFinal(nn.Module):
    """dlayer1: ReLU → ConvTranspose only (dehaze22.py:284-289 / :443-447)."""

    def __init__(self, in_c, out_c):
        super().__init__()
        self.tconv = nn.ConvTranspose2d(in_c, out_c, 4, 2, 1, bias=False)

    def forward(self, x):
        return self.tconv(F.relu(x))


def _unet_backbone(m: nn.Module, input_nc: int, nf: int):
    """Attach the shared 8-down/7-up trunk of G/G2 (dehaze22.py:205-284)."""
    m.layer1 = nn.Conv2d(input_nc, nf, 4, 2, 1, bias=False)
    m.layer2 = _UNetDown(nf, nf * 2)
    m.layer3 = _UNetDown(nf * 2, nf * 4)
    m.layer4 = _UNetDown(nf * 4, nf * 8)
    m.layer5 = _UNetDown(nf * 8, nf * 8)
    m.layer6 = _UNetDown(nf * 8, nf * 8)
    m.layer7 = _UNetDown(nf * 8, nf * 8)
    m.layer8 = _UNetDown(nf * 8, nf * 8)
    m.dlayer8 = _UNetUp(nf * 8, nf * 8, bn=False, dropout=True)
    m.dlayer7 = _UNetUp(nf * 16, nf * 8, dropout=True)
    m.dlayer6 = _UNetUp(nf * 16, nf * 8, dropout=True)
    m.dlayer5 = _UNetUp(nf * 16, nf * 8)
    m.dlayer4 = _UNetUp(nf * 16, nf * 4)
    m.dlayer3 = _UNetUp(nf * 8, nf * 2)
    m.dlayer2 = _UNetUp(nf * 4, nf)


def _unet_trunk_forward(m: nn.Module, x):
    outs = [m.layer1(x)]
    for i in range(2, 9):
        outs.append(getattr(m, f"layer{i}")(outs[-1]))
    d = outs[7]
    for i in range(8, 1, -1):
        d = getattr(m, f"dlayer{i}")(d)
        d = torch.cat([d, outs[i - 2]], 1)
    return d  # cat[dout2, out1]


class UNetGOracle(nn.Module):
    """dehaze22.G (:205-362): U-Net + 4-scale pyramid head. ``nf`` scalable
    for test speed; dlayer8 keeps the equal-in/out ConvTranspose that defeats
    layout auto-disambiguation (io/torch_import UNET_TRANSPOSED)."""

    def __init__(self, input_nc=3, output_nc=3, nf=8):
        super().__init__()
        _unet_backbone(self, input_nc, nf)
        self.dlayer1 = _UNetUpFinal(nf * 2, 20)
        for name in ("conv1010", "conv1020", "conv1030", "conv1040"):
            setattr(self, name, nn.Conv2d(20, 1, 1))
        final = nn.Module()
        inner = nn.Module()
        inner.conv = nn.Conv2d(24, output_nc, 3, 1, 1, bias=False)
        final.dlayer1 = inner  # reference reuses name='dlayer1' (dehaze22.py:286-289)
        self.dlayerfinal = final

    def forward(self, x):
        d = _unet_trunk_forward(self, x)
        dout1 = self.dlayer1(d)
        shape_out = dout1.shape[2:4]
        outs = []
        for pool, name in ((16, "conv1010"), (8, "conv1020"), (4, "conv1030"), (2, "conv1040")):
            z = F.avg_pool2d(dout1, pool)
            z = F.interpolate(F.leaky_relu(getattr(self, name)(z), 0.2), size=shape_out, mode="nearest")
            outs.append(z)
        fused = torch.cat(outs + [dout1], 1)
        return torch.tanh(self.dlayerfinal.dlayer1.conv(fused))


class UNetG2Oracle(nn.Module):
    """dehaze22.G2 (:364-488): airlight U-Net; final 'tanh' module is
    actually LeakyReLU(0.2) (:447)."""

    def __init__(self, input_nc=3, output_nc=3, nf=8):
        super().__init__()
        _unet_backbone(self, input_nc, nf)
        self.dlayer1 = _UNetUpFinal(nf * 2, output_nc)

    def forward(self, x):
        d = _unet_trunk_forward(self, x)
        return F.leaky_relu(self.dlayer1(d), 0.2)


class DehazeOracle(nn.Module):
    """dehaze22.dehaze (:662-753): J=(I−A)/t+A composition with dead
    ``tran_est``/``batch1`` members carried for state-dict parity."""

    def __init__(self):
        super().__init__()
        self.tran_est = UNetGOracle(3, 3, 64)  # dead (dehaze22.py:665)
        self.atp_est = UNetG2Oracle(3, 3, 8)
        self.tran_dense = Dense2Oracle()
        self.refine1 = nn.Conv2d(6, 20, 3, 1, 1)
        self.refine2 = nn.Conv2d(20, 20, 3, 1, 1)
        for name in ("conv1010", "conv1020", "conv1030", "conv1040"):
            setattr(self, name, nn.Conv2d(20, 1, 1))
        self.refine3 = nn.Conv2d(24, 3, 3, 1, 1)
        self.batch1 = nn.BatchNorm2d(20)  # dead (dehaze22.py:687)

    def forward(self, x):
        tran = self.tran_dense(x)
        atp = self.atp_est(x)
        zz = torch.abs(tran) + 1e-10
        shape_out = atp.shape[2:4]
        atp = F.avg_pool2d(atp, atp.shape[2])
        atp = F.interpolate(F.leaky_relu(atp, 0.2), size=shape_out, mode="nearest")
        dehaze = (x - atp) / zz + atp
        dehaze2 = dehaze
        h = torch.cat([dehaze, x], 1)
        h = F.leaky_relu(self.refine1(h), 0.2)
        h = F.leaky_relu(self.refine2(h), 0.2)
        outs = []
        for pool, name in ((32, "conv1010"), (16, "conv1020"), (8, "conv1030"), (4, "conv1040")):
            z = F.avg_pool2d(h, pool)
            z = F.interpolate(F.leaky_relu(getattr(self, name)(z), 0.2), size=shape_out, mode="nearest")
            outs.append(z)
        fused = torch.cat(outs + [h], 1)
        return torch.tanh(self.refine3(fused)), tran, atp, dehaze2
