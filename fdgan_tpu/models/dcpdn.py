"""DCPDN-lineage legacy models (reference ``models/dehaze22.py`` +
``Dense``/``Dense2`` of ``models/dehaze1113.py``).

* ``unet_g``        — 8-down/8-up skip-concat U-Net with 4-scale pyramid
                      output head (dehaze22.py:205-362)
* ``unet_g2``       — small U-Net airlight estimator, nf=8, LeakyReLU output
                      (dehaze22.py:364-488)
* ``dense_g``       — DCPDN transmission generator: densenet121 front (with
                      pool0) + bottleneck/transition decoder; ``pyramid=True``
                      adds the 4-scale pooling head (dehaze1113.py:431-699,
                      dehaze22.py:531-658)
* ``dehaze_physical`` — atmospheric-scattering composition J=(I−A)/t+A with
                      refinement + pyramid head; returns
                      (dehaze, tran, atp, dehaze2) (dehaze22.py:662-753)

The unused ``tran_est = G(...)`` member of the reference ``dehaze`` class is
kept as dead parameters for checkpoint-format parity (dehaze22.py:665 — never
called in forward).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from fdgan_tpu.models import densenet
from fdgan_tpu.models.blocks import (
    BNCtx,
    bottleneck_apply,
    bottleneck_init,
    conv_transpose2d,
    transition_apply,
    transition_init,
)
from fdgan_tpu.nn.layers import (
    avg_pool,
    batch_norm_init,
    conv2d,
    conv2d_init,
    dropout,
    leaky_relu,
    max_pool,
    relu,
    tanh,
    upsample_nearest_to,
)


# ---------------------------------------------------------------------------
# U-Net G / G2
# ---------------------------------------------------------------------------

def _unet_core_init(rng, input_nc: int, nf: int, dtype) -> dict:
    """Shared 8-down encoder + 8-up decoder parameters (dehaze22.py:209-284).

    Key names mirror the reference state dict after DataParallel-style
    dedup of blockUNet's dotted module names (``dlayer8.dlayer8.tconv`` →
    ``dlayer8.tconv``): encoder convs under ``layer{i}.conv`` except
    ``layer1`` which IS the conv (dehaze22.py:211-212 adds the bare Conv2d
    under the layer name itself), decoder ConvTranspose2d under
    ``dlayer{i}.tconv`` — so reference ``G``/``G2`` checkpoints convert
    losslessly (io/torch_import)."""
    keys = iter(jax.random.split(rng, 20))
    p = {"layer1": conv2d_init(next(keys), input_nc, nf, 4, bias=False, dtype=dtype)}
    enc_out = [nf * 2, nf * 4, nf * 8, nf * 8, nf * 8, nf * 8, nf * 8]
    in_c = nf
    for i, out_c in enumerate(enc_out, start=2):
        p[f"layer{i}"] = {
            "conv": conv2d_init(next(keys), in_c, out_c, 4, bias=False, dtype=dtype),
            "bn": batch_norm_init(out_c, dtype),
        }
        in_c = out_c
    dec_in = [nf * 8, nf * 16, nf * 16, nf * 16, nf * 16, nf * 8, nf * 4]
    dec_out = [nf * 8, nf * 8, nf * 8, nf * 8, nf * 4, nf * 2, nf]
    for i, (ic, oc) in zip(range(8, 1, -1), zip(dec_in, dec_out)):
        layer = {"tconv": conv2d_init(next(keys), ic, oc, 4, bias=False, dtype=dtype)}
        if i != 8:  # dlayer8 has bn=False (dehaze22.py:246)
            layer["bn"] = batch_norm_init(oc, dtype)
        p[f"dlayer{i}"] = layer
    return p


def _unet_core_apply(p, x, bn: BNCtx, rng, train: bool):
    """Encoder (LeakyReLU pre-act after layer1) + skip-concat decoder
    (ReLU pre-act, transposed convs, dropout on dlayer8/7/6)."""
    outs = []
    h = conv2d(p["layer1"], x, stride=2, padding=1)
    outs.append(h)
    for i in range(2, 9):
        layer = p[f"layer{i}"]
        h = conv2d(layer["conv"], leaky_relu(h, 0.2), stride=2, padding=1)
        h = bn(layer["bn"], h, f"layer{i}.bn")
        outs.append(h)
    rngs = jax.random.split(rng, 3) if rng is not None else [None] * 3
    d = outs[7]
    for j, i in enumerate(range(8, 1, -1)):
        layer = p[f"dlayer{i}"]
        d = conv_transpose2d(layer["tconv"], relu(d), stride=2, padding=1)
        if "bn" in layer:
            d = bn(layer["bn"], d, f"dlayer{i}.bn")
        if i >= 6:  # dropout 0.5 on dlayer8/7/6 (dehaze22.py:246-257)
            d = dropout(rngs[8 - i] if rng is not None else None, d, 0.5, train)
        if i > 2:
            d = jnp.concatenate([d, outs[i - 2]], axis=-1)
    return jnp.concatenate([d, outs[0]], axis=-1)


def _pyramid_head(p, feat, pools, bn_unused=None):
    """4-scale avg-pool → 1×1 conv → LeakyReLU → nearest-upsample head
    (dehaze22.py:344-360)."""
    h_w = feat.shape[1:3]
    branches = []
    for name, win in zip(("conv1010", "conv1020", "conv1030", "conv1040"), pools):
        z = avg_pool(feat, win)
        z = leaky_relu(conv2d(p[name], z, padding=0), 0.2)
        branches.append(upsample_nearest_to(z, h_w))
    return jnp.concatenate(branches + [feat], axis=-1)


def unet_g_init(rng, input_nc: int = 3, output_nc: int = 3, nf: int = 64, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(rng, 8))
    p = _unet_core_init(next(keys), input_nc, nf, dtype)
    p["dlayer1"] = {"tconv": conv2d_init(next(keys), nf * 2, 20, 4, bias=False, dtype=dtype)}
    for name in ("conv1010", "conv1020", "conv1030", "conv1040"):
        p[name] = conv2d_init(next(keys), 20, 1, 1, dtype=dtype)
    # the reference builds dlayerfinal with the `name` variable still set to
    # 'dlayer1' (dehaze22.py:286-289) → state key dlayerfinal.dlayer1.conv
    p["dlayerfinal"] = {"dlayer1": {"conv": conv2d_init(next(keys), 24, output_nc, 3, bias=False, dtype=dtype)}}
    return p


def unet_g_apply(
    p: dict,
    x: jax.Array,
    bn: Optional[BNCtx] = None,
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> jax.Array:
    bn = bn or BNCtx()
    d = _unet_core_apply(p, x, bn, rng, train)
    d1 = conv_transpose2d(p["dlayer1"]["tconv"], relu(d), stride=2, padding=1)
    fused = _pyramid_head(p, d1, (16, 8, 4, 2))
    return tanh(conv2d(p["dlayerfinal"]["dlayer1"]["conv"], fused, padding=1))


def unet_g2_init(rng, input_nc: int = 3, output_nc: int = 3, nf: int = 8, dtype=jnp.float32) -> dict:
    r1, r2 = jax.random.split(rng)
    p = _unet_core_init(r1, input_nc, nf, dtype)
    p["dlayer1"] = {"tconv": conv2d_init(r2, nf * 2, output_nc, 4, bias=False, dtype=dtype)}
    return p


def unet_g2_apply(
    p: dict,
    x: jax.Array,
    bn: Optional[BNCtx] = None,
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> jax.Array:
    bn = bn or BNCtx()
    d = _unet_core_apply(p, x, bn, rng, train)
    d1 = conv_transpose2d(p["dlayer1"]["tconv"], relu(d), stride=2, padding=1)
    return leaky_relu(d1, 0.2)  # final 'tanh' module is actually LeakyReLU (dehaze22.py:445)


# ---------------------------------------------------------------------------
# Dense / Dense2 (DCPDN transmission generator)
# ---------------------------------------------------------------------------

def dense_g_init(rng, pyramid: bool = True, dtype=jnp.float32) -> dict:
    """dehaze1113.Dense (pyramid=False, the 'batchnorm20' variant) /
    dehaze1113.Dense2 ≡ dehaze22.Dense (pyramid=True)."""
    keys = iter(jax.random.split(rng, 32))
    p = densenet.densenet_stem_init(next(keys), dtype)
    p["dense_block1"] = densenet.dense_block_init(next(keys), 64, 6, dtype)
    p["trans_block1"] = densenet.transition_init(next(keys), 256, 128, dtype)
    p["dense_block2"] = densenet.dense_block_init(next(keys), 128, 12, dtype)
    p["trans_block2"] = densenet.transition_init(next(keys), 512, 256, dtype)
    p["dense_block3"] = densenet.dense_block_init(next(keys), 256, 24, dtype)
    p["trans_block3"] = densenet.transition_init(next(keys), 1024, 512, dtype)
    p["dense_block4"] = bottleneck_init(next(keys), 512, 256, dtype=dtype)
    p["trans_block4"] = transition_init(next(keys), 768, 128, dtype)
    p["dense_block5"] = bottleneck_init(next(keys), 384, 256, dtype=dtype)
    p["trans_block5"] = transition_init(next(keys), 640, 128, dtype)
    p["dense_block6"] = bottleneck_init(next(keys), 256, 128, dtype=dtype)
    p["trans_block6"] = transition_init(next(keys), 384, 64, dtype)
    p["dense_block7"] = bottleneck_init(next(keys), 64, 64, dtype=dtype)
    p["trans_block7"] = transition_init(next(keys), 128, 32, dtype)
    p["dense_block8"] = bottleneck_init(next(keys), 32, 32, dtype=dtype)
    p["trans_block8"] = transition_init(next(keys), 64, 16, dtype)
    p["conv_refin"] = conv2d_init(next(keys), 19, 20, 3, dtype=dtype)
    for name in ("conv1010", "conv1020", "conv1030", "conv1040"):
        p[name] = conv2d_init(next(keys), 20, 1, 1, dtype=dtype)
    if pyramid:
        p["refine3"] = conv2d_init(next(keys), 24, 3, 3, dtype=dtype)
    else:
        p["refine3"] = conv2d_init(next(keys), 20, 3, 3, dtype=dtype)
        p["batchnorm20"] = batch_norm_init(20, dtype)
        p["batchnorm1"] = batch_norm_init(1, dtype)  # dead (dehaze1113.py:497)
    return p


def dense_g_apply(
    p: dict,
    x: jax.Array,
    pyramid: bool = True,
    bn: Optional[BNCtx] = None,
) -> jax.Array:
    bn = bn or BNCtx()
    # densenet stem WITH pool0 (dehaze1113.py:503: pool0(relu0(norm0(conv0))))
    h = conv2d(p["conv0"], x, stride=2, padding=3)
    h = relu(bn(p["norm0"], h, "norm0"))
    x0 = max_pool(h, 3, stride=2, padding=1)

    x1 = densenet.dense_block_apply(p["dense_block1"], x0, bn.sub("dense_block1"))
    x1 = densenet.transition_apply(p["trans_block1"], x1, bn.sub("trans_block1"))
    x2 = densenet.dense_block_apply(p["dense_block2"], x1, bn.sub("dense_block2"))
    x2 = densenet.transition_apply(p["trans_block2"], x2, bn.sub("trans_block2"))
    x3 = densenet.dense_block_apply(p["dense_block3"], x2, bn.sub("dense_block3"))
    x3 = densenet.transition_apply(p["trans_block3"], x3, bn.sub("trans_block3"))

    x4 = bottleneck_apply(p["dense_block4"], x3, bn=bn.sub("dense_block4"))
    x4 = transition_apply(p["trans_block4"], x4, resize="up2", bn=bn.sub("trans_block4"))
    x42 = jnp.concatenate([x4, x2], axis=-1)
    x5 = bottleneck_apply(p["dense_block5"], x42, bn=bn.sub("dense_block5"))
    x5 = transition_apply(p["trans_block5"], x5, resize="up2", bn=bn.sub("trans_block5"))
    x52 = jnp.concatenate([x5, x1], axis=-1)
    x6 = bottleneck_apply(p["dense_block6"], x52, bn=bn.sub("dense_block6"))
    x6 = transition_apply(p["trans_block6"], x6, resize="up2", bn=bn.sub("trans_block6"))
    x7 = bottleneck_apply(p["dense_block7"], x6, bn=bn.sub("dense_block7"))
    x7 = transition_apply(p["trans_block7"], x7, resize="up2", bn=bn.sub("trans_block7"))
    x8 = bottleneck_apply(p["dense_block8"], x7, bn=bn.sub("dense_block8"))
    x8 = transition_apply(p["trans_block8"], x8, resize="up2", bn=bn.sub("trans_block8"))

    x8 = jnp.concatenate([x8, x], axis=-1)
    if pyramid:
        x9 = leaky_relu(conv2d(p["conv_refin"], x8, padding=1), 0.2)
        fused = _pyramid_head(p, x9, (32, 16, 8, 4))
        return tanh(conv2d(p["refine3"], fused, padding=1))
    # dehaze1113.Dense: BN20 + LeakyReLU, no pyramid (dehaze1113.py:547,565)
    x9 = leaky_relu(bn(p["batchnorm20"], conv2d(p["conv_refin"], x8, padding=1), "batchnorm20"), 0.2)
    return tanh(conv2d(p["refine3"], x9, padding=1))


# ---------------------------------------------------------------------------
# dehaze — atmospheric-scattering physical model
# ---------------------------------------------------------------------------

def dehaze_physical_init(rng, input_nc: int = 3, output_nc: int = 3, nf: int = 64, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(rng, 10))
    p = {
        "tran_est": unet_g_init(next(keys), 3, 3, 64, dtype),  # dead (dehaze22.py:665)
        "atp_est": unet_g2_init(next(keys), 3, 3, 8, dtype),
        "tran_dense": dense_g_init(next(keys), pyramid=True, dtype=dtype),
        "refine1": conv2d_init(next(keys), 6, 20, 3, dtype=dtype),
        "refine2": conv2d_init(next(keys), 20, 20, 3, dtype=dtype),
        "refine3": conv2d_init(next(keys), 24, 3, 3, dtype=dtype),
        "batch1": batch_norm_init(20, dtype),  # dead (dehaze22.py:687)
    }
    for name in ("conv1010", "conv1020", "conv1030", "conv1040"):
        p[name] = conv2d_init(next(keys), 20, 1, 1, dtype=dtype)
    return p


def dehaze_physical_apply(
    p: dict,
    x: jax.Array,
    bn: Optional[BNCtx] = None,
    rng: Optional[jax.Array] = None,
    train: bool = False,
):
    """J = (I − A)/t + A composition (dehaze22.py:690-753). Returns
    (dehaze, tran, atp, dehaze2)."""
    bn = bn or BNCtx()
    tran = dense_g_apply(p["tran_dense"], x, pyramid=True, bn=bn.sub("tran_dense"))
    atp = unet_g2_apply(p["atp_est"], x, bn.sub("atp_est"), rng, train)

    zz = jnp.abs(tran) + 1e-10
    h_w = atp.shape[1:3]
    # global average over the map, then LeakyReLU, broadcast back (dehaze22.py:710-711)
    atp = avg_pool(atp, atp.shape[1])
    atp = upsample_nearest_to(leaky_relu(atp, 0.2), h_w)

    dehaze = (x - atp) / zz + atp
    dehaze2 = dehaze

    h = jnp.concatenate([dehaze, x], axis=-1)
    h = leaky_relu(conv2d(p["refine1"], h, padding=1), 0.2)
    h = leaky_relu(conv2d(p["refine2"], h, padding=1), 0.2)
    fused = _pyramid_head(p, h, (32, 16, 8, 4))
    out = tanh(conv2d(p["refine3"], fused, padding=1))
    return out, tran, atp, dehaze2
