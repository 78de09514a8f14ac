"""FDGAN generator — the model the reference's ``demo.py`` runs.

Exact functional re-design of ``models/dehaze1113.py:702-801`` (FDGAN class):
a full-resolution densely-connected encoder-decoder with DenseNet-121 blocks
as the encoder and multi-scale skip fusions, tanh output in [-1, 1].

Channel/spatial flow (input H×W, H and W divisible by 8; line refs are the
reference file):

    x0  = relu(conv_refin1(x))                       3→64   @H      (:744,:760)
    x01 = conv_refin2(avgpool2(x0))                  64→32  @H/2    (:751,:763)
    x1  = trans1(dense1(x0))                         64→256→128 ÷2  (:713,:767-769)
    x10 = conv_refine4(cat[x01,x1])                  160→128 @H/2   (:755,:773)
    x2  = trans2(dense2(x10))                        128→512→256 ÷2 (:717,:774)
    x3  = trans3(dense3(x2))                         256→1024→512 ÷2(:721,:778)
    x22 = conv_refin5(avgpool2(x2))                  256→128 @H/8   (:747,:780)
    x4  = transdy4(densedy4(conv_refin6(cat[x3,x22])))  640→512→768→128 ×2 (:731,:746,:783)
    x42 = cat[x4,x2]                                 384 @H/4       (:786)
    x5  = transdy5(densedy5(x42))                    384→512→64 ×2  (:735,:790)
    x6  = transdy6(densedy6(x5))                     64→96→16 ×2    (:739,:795)
    out = tanh(conv_refin3(x6))                      16→3           (:749,:799)

Checkpoint-format parity: the reference `.pth` files carry parameters for
modules that the forward never uses — densenet ``conv0`` (:709), densenet
block4 + norm5 as ``dense_block31``/``dense_norm31`` (:725-728), and the BN
layers inside every *dy block (constructed but skipped in their forwards).
All of these dead parameters are kept in the tree so conversion is lossless
both ways.

BatchNorm runs on batch statistics by default — the published way to run the
reference checkpoints (its README instructs ``netG.train()``).
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
    transition_apply,
    transition_init,
)
from fdgan_tpu.nn.layers import avg_pool, conv2d, conv2d_init, relu, tanh


def init(rng: jax.Array, dtype=jnp.float32) -> dict:
    """Random-init FDGAN parameter tree (torch attr names preserved)."""
    keys = iter(jax.random.split(rng, 24))
    p = {}
    # --- densenet121 encoder pieces (dehaze1113.py:707-728) ---
    p["conv0"] = conv2d_init(next(keys), 3, 64, 7, bias=False, dtype=dtype)  # dead (:709)
    p["dense_block1"] = densenet.dense_block_init(next(keys), 64, 6, dtype)
    p["trans_block1"] = densenet.transition_init(next(keys), 256, 128, dtype)
    p["dense_block2"] = densenet.dense_block_init(next(keys), 128, 12, dtype)
    p["trans_block2"] = densenet.transition_init(next(keys), 512, 256, dtype)
    p["dense_block3"] = densenet.dense_block_init(next(keys), 256, 24, dtype)
    p["trans_block3"] = densenet.transition_init(next(keys), 1024, 512, dtype)
    p["dense_block31"] = densenet.dense_block_init(next(keys), 512, 16, dtype)  # dead (:725)
    p["dense_norm31"] = densenet.batch_norm_init(1024, dtype)  # dead (:728)
    # --- decoder (dy blocks; their internal BNs are dead params) ---
    p["dense_block4"] = bottleneck_init(next(keys), 512, 256, dtype=dtype)
    p["trans_block4"] = transition_init(next(keys), 768, 128, dtype)
    p["dense_block5"] = bottleneck_init(next(keys), 384, 128, dtype=dtype)
    p["trans_block5"] = transition_init(next(keys), 512, 64, dtype)
    p["dense_block6"] = bottleneck_init(next(keys), 64, 32, dtype=dtype)
    p["trans_block6"] = transition_init(next(keys), 96, 16, dtype)
    # --- refinement convs (:744-755) ---
    p["conv_refin1"] = conv2d_init(next(keys), 3, 64, 3, dtype=dtype)
    p["conv_refin2"] = conv2d_init(next(keys), 64, 32, 1, dtype=dtype)
    p["conv_refin3"] = conv2d_init(next(keys), 16, 3, 3, dtype=dtype)
    p["conv_refin5"] = conv2d_init(next(keys), 256, 128, 1, dtype=dtype)
    p["conv_refin6"] = conv2d_init(next(keys), 640, 512, 3, dtype=dtype)
    p["conv_refine4"] = conv2d_init(next(keys), 160, 128, 3, dtype=dtype)  # sic: 'refine'
    return p


def apply(
    params: dict,
    x: jax.Array,
    bn_mode: str = "batch",
    stats_out: Optional[dict] = None,
    impl: str = "xla",
    interpret: bool = False,
) -> jax.Array:
    """FDGAN forward (NHWC in [-1,1]-compatible range, NHWC out in [-1,1]).

    ``bn_mode='batch'`` reproduces the reference's published inference
    behaviour (train-mode BN); ``'running'`` uses stored statistics.
    ``impl='pallas'`` routes the three encoder dense blocks through the
    fused Pallas kernel (ops/pallas_dense.py) — differentiable (custom VJP)
    and stats-capturing, so it works under the train step too; ``interpret``
    runs the kernels in interpreter mode (CPU testing).
    """
    bn = BNCtx(bn_mode, stats_out)

    if impl == "pallas":
        from fdgan_tpu.ops.pallas_dense import dense_block_fused

        def dblock(p, xx, name):
            return dense_block_fused(
                p, xx, mode=bn_mode, interpret=interpret,
                stats_out=stats_out, prefix=f"{name}.",
            )
    elif impl == "xla":
        def dblock(p, xx, name):
            return densenet.dense_block_apply(p, xx, bn.sub(name))
    else:
        raise ValueError(f"unknown impl {impl!r}")

    x0 = relu(conv2d(params["conv_refin1"], x, padding=1))
    x01 = conv2d(params["conv_refin2"], avg_pool(x0, 2), padding=0)

    x1 = dblock(params["dense_block1"], x0, "dense_block1")
    x1 = densenet.transition_apply(params["trans_block1"], x1, bn.sub("trans_block1"))

    x10 = conv2d(params["conv_refine4"], jnp.concatenate([x01, x1], axis=-1), padding=1)
    x2 = dblock(params["dense_block2"], x10, "dense_block2")
    x2 = densenet.transition_apply(params["trans_block2"], x2, bn.sub("trans_block2"))

    x3 = dblock(params["dense_block3"], x2, "dense_block3")
    x3 = densenet.transition_apply(params["trans_block3"], x3, bn.sub("trans_block3"))
    x22 = conv2d(params["conv_refin5"], avg_pool(x2, 2), padding=0)

    x4 = conv2d(params["conv_refin6"], jnp.concatenate([x3, x22], axis=-1), padding=1)
    x4 = bottleneck_apply(params["dense_block4"], x4, use_bn=False)
    x4 = transition_apply(params["trans_block4"], x4, resize="up2", use_bn=False)

    x42 = jnp.concatenate([x4, x2], axis=-1)
    x5 = bottleneck_apply(params["dense_block5"], x42, use_bn=False)
    x5 = transition_apply(params["trans_block5"], x5, resize="up2", use_bn=False)

    x6 = bottleneck_apply(params["dense_block6"], x5, use_bn=False)
    x6 = transition_apply(params["trans_block6"], x6, resize="up2", use_bn=False)

    return tanh(conv2d(params["conv_refin3"], x6, padding=1))
