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
