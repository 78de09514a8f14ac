"""Microbenchmark: dense-block formulations on TPU.

A: reference-style — concat[x, f1..fi] materialised per layer, BN over concat.
B: segment-accumulation — no concats; each layer's 1x1 conv computed as a sum
   of per-segment matmuls (BN folded per segment since channels partition);
   segments kept as separate buffers.
C: like A but BN in running mode (affine only) to isolate the BN-stats cost.

All three compute the SAME function when BN uses the same statistics source.
Shapes: block3-like — 128x128 spatial, in=256, 24 layers, growth 32.
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fdgan_tpu.models import densenet
from fdgan_tpu.models.blocks import BNCtx
from fdgan_tpu.nn.layers import batch_norm, conv2d, relu

B = 8
H = W = int(sys.argv[1]) if len(sys.argv) > 1 else 128
IN = int(sys.argv[2]) if len(sys.argv) > 2 else 256
LAYERS = int(sys.argv[3]) if len(sys.argv) > 3 else 24
DTYPE = jnp.bfloat16

params = densenet.dense_block_init(jax.random.PRNGKey(0), IN, LAYERS, jnp.float32)
x = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, IN), DTYPE)


def variant_a(p, x, mode="batch"):
    return densenet.dense_block_apply(p, x, BNCtx(mode))


def _bn_relu_seg(bn_params, lo, hi, seg, mode):
    """Apply layer-specific norm1 params restricted to channel range [lo,hi)
    on a standalone segment (channels partition ⇒ batch stats match the
    concat formulation exactly)."""
    sub = {k: v[lo:hi] for k, v in bn_params.items()}
    return relu(batch_norm(sub, seg, mode=mode))


def variant_b(p, x, mode="batch"):
    segs = [x]  # channel segments: [in], then 32 per layer
    offsets = [0, IN]
    for i in range(LAYERS):
        lp = p[f"denselayer{i + 1}"]
        k1 = lp["conv1"]["kernel"]  # (1,1,total_in,128)
        acc = None
        for j, seg in enumerate(segs):
            lo, hi = offsets[j], offsets[j + 1]
            h = _bn_relu_seg(lp["norm1"], lo, hi, seg, mode)
            part = conv2d({"kernel": k1[:, :, lo:hi, :]}, h, padding=0)
            acc = part if acc is None else acc + part
        h = relu(batch_norm(lp["norm2"], acc, mode=mode))
        f = conv2d(lp["conv2"], h, padding=1)
        segs.append(f)
        offsets.append(offsets[-1] + 32)
    return jnp.concatenate(segs, axis=-1)


def timed(fn, label, iters=10):
    jfn = jax.jit(lambda p, v: fn(p, v))

    @jax.jit
    def loop(p, v):
        def body(i, carry):
            y = fn(p, v + carry * jnp.asarray(1e-6, v.dtype))
            return jnp.max(jnp.abs(y)).astype(v.dtype)

        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), v.dtype))

    float(loop(params, x))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(loop(params, x))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:44s} {best / iters * 1000:8.2f} ms/iter")
    return best / iters


import numpy as np

# correctness: B == A
ya = jax.jit(lambda: variant_a(params, x))()
yb = jax.jit(lambda: variant_b(params, x))()
err = float(jnp.max(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32))))
print(f"max |A−B| = {err:.5f}")

timed(variant_a, f"A concat, batch BN   ({H}px,{IN}ch,{LAYERS}L)")
timed(lambda p, v: variant_a(p, v, "running"), "C concat, running BN")
timed(variant_b, "B segments, batch BN")
timed(lambda p, v: variant_b(p, v, "running"), "B segments, running BN")
