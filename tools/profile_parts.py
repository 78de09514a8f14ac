"""Per-stage FDGAN timing on the live chip: which part eats the time, and
what batch-stats BN costs vs running-stats BN. Uses the same single-dispatch
on-device loop methodology as bench.py."""

import json
import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fdgan_tpu.models import densenet, fdgan
from fdgan_tpu.models.blocks import BNCtx, bottleneck_apply, transition_apply
from fdgan_tpu.nn.layers import avg_pool, conv2d, relu
from fdgan_tpu.nn.tree import cast_tree

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 512
ITERS = 10

params = cast_tree(fdgan.init(jax.random.PRNGKey(0)), jnp.bfloat16)


def timed(fn, *args, iters=ITERS, label=""):
    @partial(jax.jit, static_argnums=())
    def loop(a):
        def body(i, carry):
            y = fn(*(x + carry * jnp.asarray(1e-6, x.dtype) if j == 0 else x for j, x in enumerate(a)))
            return jnp.max(jnp.abs(y)).astype(a[0].dtype)

        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), a[0].dtype))

    float(loop(args))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(loop(args))
        best = min(best, time.perf_counter() - t0)
    per_iter = best / iters
    print(f"{label:36s} {per_iter * 1000:8.2f} ms/iter  ({BATCH / per_iter:7.1f} img/s)")
    return per_iter


def stage1(x, mode="batch"):
    bn = BNCtx(mode)
    x0 = relu(conv2d(params["conv_refin1"], x, padding=1))
    x1 = densenet.dense_block_apply(params["dense_block1"], x0, bn.sub("dense_block1"))
    return densenet.transition_apply(params["trans_block1"], x1, bn.sub("trans_block1"))


def stage2(x10, mode="batch"):
    bn = BNCtx(mode)
    x2 = densenet.dense_block_apply(params["dense_block2"], x10, bn.sub("dense_block2"))
    return densenet.transition_apply(params["trans_block2"], x2, bn.sub("trans_block2"))


def stage3(x2, mode="batch"):
    bn = BNCtx(mode)
    x3 = densenet.dense_block_apply(params["dense_block3"], x2, bn.sub("dense_block3"))
    return densenet.transition_apply(params["trans_block3"], x3, bn.sub("trans_block3"))


def decoder(x3, x2, mode="batch"):
    x22 = conv2d(params["conv_refin5"], avg_pool(x2, 2), padding=0)
    x4 = conv2d(params["conv_refin6"], jnp.concatenate([x3, x22], axis=-1), padding=1)
    x4 = bottleneck_apply(params["dense_block4"], x4, use_bn=False)
    x4 = transition_apply(params["trans_block4"], x4, resize="up2", use_bn=False)
    x42 = jnp.concatenate([x4, x2], axis=-1)
    x5 = bottleneck_apply(params["dense_block5"], x42, use_bn=False)
    x5 = transition_apply(params["trans_block5"], x5, resize="up2", use_bn=False)
    x6 = bottleneck_apply(params["dense_block6"], x5, use_bn=False)
    x6 = transition_apply(params["trans_block6"], x6, resize="up2", use_bn=False)
    return jnp.tanh(conv2d(params["conv_refin3"], x6, padding=1))


x = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, SIZE, SIZE, 3), jnp.bfloat16)
x10 = jax.random.uniform(jax.random.PRNGKey(2), (BATCH, SIZE // 2, SIZE // 2, 128), jnp.bfloat16)
x2 = jax.random.uniform(jax.random.PRNGKey(3), (BATCH, SIZE // 4, SIZE // 4, 256), jnp.bfloat16)
x3 = jax.random.uniform(jax.random.PRNGKey(4), (BATCH, SIZE // 8, SIZE // 8, 512), jnp.bfloat16)

total = timed(lambda v: fdgan.apply(params, v), x, label="full forward (batch BN)")
timed(lambda v: fdgan.apply(params, v, bn_mode="running"), x, label="full forward (running BN)")
t1 = timed(stage1, x, label=f"stage1: block1 @{SIZE}")
t2 = timed(stage2, x10, label=f"stage2: block2 @{SIZE//2}")
t3 = timed(stage3, x2, label=f"stage3: block3 @{SIZE//4}")
t4 = timed(decoder, x3, x2, label="decoder")
print(f"{'sum of stages':36s} {(t1+t2+t3+t4)*1000:8.2f} ms/iter  vs full {total*1000:.2f}")
