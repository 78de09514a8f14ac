"""Memory-efficient DenseNet dehazing network (SURVEY.md §2.4 #15).

Working TPU re-design of the reference's abandoned ``models/densenet.py``
(DenseNet with block_config=(16,16,16,16) + decoder blocks 5-8 and a tanh
dehaze head, :245-371). The reference file does not import — broken
indentation at :333, inconsistent channel counts, `cp.checkpoint` import
commented out — so this module keeps the *capability* (deep dense encoder,
gradient-checkpointed dense blocks, no-concat dy1 decoder, tanh output)
with corrected channel arithmetic:

    conv0 3→64 (3×3 s1) → relu
    block1 64→576  → trans ÷2 → 288
    block2 288→800 → trans ÷2 → 400
    block3 400→912 → trans ÷2 → 456
    block4 456→968 → trans ÷2 → 484
    up5: 484→256 ×2, cat x3(456) → 712
    up6: 712→384 ×2, cat x2(400) → 784
    up7: 784→256 ×2
    up8: 256→32  ×2 → refine 32→3 → tanh

The torch `cp.checkpoint` memory trick (densenet.py:204-205, imports
commented) becomes `jax.checkpoint` rematerialisation over each dense block
— the TPU-native way to trade FLOPs for activation memory at train time.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from fdgan_tpu.models import densenet
from fdgan_tpu.models.blocks import BNCtx, bottleneck_apply, bottleneck_init, transition_apply, transition_init
from fdgan_tpu.nn.layers import conv2d, conv2d_init, relu, tanh

BLOCK_CONFIG = (16, 16, 16, 16)
GROWTH = 32
COMPRESSION = 0.5


def init(rng: jax.Array, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(rng, 24))
    p = {"conv0": conv2d_init(next(keys), 3, 64, 3, bias=False, dtype=dtype)}
    ch = 64
    for i, n_layers in enumerate(BLOCK_CONFIG, start=1):
        p[f"denseblock{i}"] = densenet.dense_block_init(next(keys), ch, n_layers, dtype)
        ch += n_layers * GROWTH
        out = int(ch * COMPRESSION)
        p[f"transition{i}"] = densenet.transition_init(next(keys), ch, out, dtype)
        ch = out
    # decoder (no-concat dy1 blocks — dehaze1113.py:278-297 semantics)
    p["dense_block5"] = bottleneck_init(next(keys), 484, 256, dtype=dtype)
    p["trans_block5"] = transition_init(next(keys), 256, 256, dtype)
    p["dense_block6"] = bottleneck_init(next(keys), 712, 384, dtype=dtype)
    p["trans_block6"] = transition_init(next(keys), 384, 384, dtype)
    p["dense_block7"] = bottleneck_init(next(keys), 784, 256, dtype=dtype)
    p["trans_block7"] = transition_init(next(keys), 256, 256, dtype)
    p["dense_block8"] = bottleneck_init(next(keys), 256, 128, dtype=dtype)
    p["trans_block8"] = transition_init(next(keys), 128, 32, dtype)
    p["refine3"] = conv2d_init(next(keys), 32, 3, 3, dtype=dtype)
    return p


def apply(
    params: dict,
    x: jax.Array,
    bn_mode: str = "batch",
    stats_out: Optional[dict] = None,
    remat: bool = False,
) -> jax.Array:
    """Forward. ``remat=True`` wraps each dense block in `jax.checkpoint`,
    recomputing activations in the backward pass (the memory-efficiency
    feature of the reference design, TPU-style)."""
    bn = BNCtx(bn_mode, stats_out)

    def block(i):
        def run(h):
            h = densenet.dense_block_apply(params[f"denseblock{i}"], h, bn.sub(f"denseblock{i}"))
            return densenet.transition_apply(params[f"transition{i}"], h, bn.sub(f"transition{i}"))

        # remat is only valid when not capturing BN stats (pure function)
        if remat and stats_out is None:
            return jax.checkpoint(run)
        return run

    x0 = relu(conv2d(params["conv0"], x, padding=1))
    x1 = block(1)(x0)
    x2 = block(2)(x1)
    x3 = block(3)(x2)
    x4 = block(4)(x3)

    def up(i, h, resize="up2"):
        h = bottleneck_apply(params[f"dense_block{i}"], h, use_bn=False, concat=False)
        return transition_apply(params[f"trans_block{i}"], h, resize=resize, use_bn=False)

    x5 = up(5, x4)
    x53 = jnp.concatenate([x5, x3], axis=-1)
    x6 = up(6, x53)
    x62 = jnp.concatenate([x6, x2], axis=-1)
    x7 = up(7, x62)
    x8 = up(8, x7)
    return tanh(conv2d(params["refine3"], x8, padding=1))
