"""Feasibility probe for a two-phase Pallas dense-layer pipeline that never
materialises the raw concat (multi-ref segment reads) and runs conv2 as one
tap-packed N=288 matmul with the shift-add done in VMEM.

Questions (block1 shapes, 8x512x512):
  1. aggregate DMA rate reading 4 separate segment arrays vs 1 contiguous
  2. in-kernel MXU rate of the packed conv2 (N=288) vs the 9-dot loop
  3. cost of an h (128ch) HBM round-trip between phase A and phase B

Run: PYTHONPATH=/root/repo python tools/probe_pallas5.py [--interpret]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

INTERPRET = "--interpret" in sys.argv
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")

B, H, W = (2, 64, 64) if INTERPRET else (8, 512, 512)
k = jax.random.PRNGKey
u = lambda s, sh, dt=jnp.bfloat16: jax.random.uniform(k(s), sh, dt)


def timed(fn, args, label, flops=0, nbytes=0, iters=10):
    if INTERPRET:
        return
    @jax.jit
    def loop(*a):
        def body(i, c):
            y = fn(a[0] + c * jnp.asarray(1e-6, a[0].dtype), *a[1:])
            return jnp.max(jnp.abs(y)).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.bfloat16))
    float(loop(*args))
    t0 = time.perf_counter(); float(loop(*args)); dt = (time.perf_counter() - t0) / iters
    print(f"{label:48s} {dt*1000:7.2f} ms  {flops/dt/1e12:6.1f} TF/s  {nbytes/dt/1e9:5.0f} GB/s",
          flush=True)


# --------------------------------------------------------------------------
# Q1: multi-ref segment reads — 4 arrays (64+32+32+32 ch) -> affine-relu ->
# one 1x1 matmul, vs the same from a single pre-concatenated array
# --------------------------------------------------------------------------

TH = 8
SEGS = (64, 32, 32, 32)
C = sum(SEGS)


def _seg_kernel(*refs):
    (s0, s1, s2, s3, a_ref, b_ref, w_ref, o_ref) = refs
    x = jnp.concatenate([s0[0], s1[0], s2[0], s3[0]], axis=-1)  # VMEM concat
    a = a_ref[0]
    b = b_ref[0]
    t = jnp.maximum(x.astype(jnp.float32) * a + b, 0.0).astype(w_ref.dtype)
    o_ref[0] = jnp.dot(
        t.reshape(TH * W, C), w_ref[:], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype).reshape(TH, W, 128)


def seg_conv1(segs, a, b, w):
    n = H // TH
    in_specs = [
        pl.BlockSpec((1, TH, W, c), lambda i, t: (i, t, 0, 0), memory_space=pltpu.VMEM)
        for c in SEGS
    ] + [
        pl.BlockSpec((1, C), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((C, 128), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        _seg_kernel,
        grid=(B, n),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, TH, W, 128), lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, 128), segs[0].dtype),
        interpret=INTERPRET,
    )(*segs, a.reshape(1, -1).astype(jnp.float32), b.reshape(1, -1).astype(jnp.float32),
      w.astype(segs[0].dtype))


def _mono_kernel(x_ref, a_ref, b_ref, w_ref, o_ref):
    x = x_ref[0]
    t = jnp.maximum(x.astype(jnp.float32) * a_ref[0] + b_ref[0], 0.0).astype(w_ref.dtype)
    o_ref[0] = jnp.dot(
        t.reshape(TH * W, C), w_ref[:], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype).reshape(TH, W, 128)


def mono_conv1(x, a, b, w):
    n = H // TH
    return pl.pallas_call(
        _mono_kernel,
        grid=(B, n),
        in_specs=[
            pl.BlockSpec((1, TH, W, C), lambda i, t: (i, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 128), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, W, 128), lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, 128), x.dtype),
        interpret=INTERPRET,
    )(x, a.reshape(1, -1).astype(jnp.float32), b.reshape(1, -1).astype(jnp.float32),
      w.astype(x.dtype))


# --------------------------------------------------------------------------
# Q2: packed conv2 — g (128ch) -> f (32ch); one (TH*(W+2), 128)@(128, 288)
# matmul + VMEM shift-add, vs the 9-dot loop of ops/pallas_dense.py
# --------------------------------------------------------------------------

def _conv2_9dot_kernel(g_ref, halo_ref, w_ref, o_ref):
    th, w = TH, W
    g = g_ref[0]
    top = halo_ref[0, 0, 0]
    bot = halo_ref[0, 0, 1]
    gw = jnp.concatenate([top[None], g, bot[None]], axis=0)
    gp = jnp.pad(gw, ((0, 0), (1, 1), (0, 0)))
    acc = jnp.zeros((th * w, 32), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            seg = gp[dy : dy + th, dx : dx + w, :].reshape(th * w, 128)
            wseg = w_ref[(dy * 3 + dx) * 128 : (dy * 3 + dx + 1) * 128, :]
            acc = acc + jnp.dot(seg, wseg, preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype).reshape(th, w, 32)


def _conv2_packed_kernel(g_ref, halo_ref, w_ref, o_ref):
    th, w = TH, W
    g = g_ref[0]
    top = halo_ref[0, 0, 0]
    bot = halo_ref[0, 0, 1]
    gw = jnp.concatenate([top[None], g, bot[None]], axis=0)      # (TH+2, W, 128)
    gp = jnp.pad(gw, ((0, 0), (1, 1), (0, 0)))                   # (TH+2, W+2, 128)
    # one full-width matmul: N = 9*32 = 288
    contrib = jnp.dot(
        gp.reshape((th + 2) * (w + 2), 128), w_ref[:],
        preferred_element_type=jnp.float32,
    ).reshape(th + 2, w + 2, 3, 3, 32)
    acc = jnp.zeros((th, w, 32), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            acc = acc + contrib[dy : dy + th, dx : dx + w, dy, dx]
    o_ref[0] = acc.astype(o_ref.dtype).reshape(th, w, 32)


def conv2(g, halo, w2, kernel, packed):
    n = H // TH
    if packed:
        # w packed as (128, 288): w2[dy,dx,c,f] -> wp[c, (dy*3+dx)*32+f]
        wk = w2.transpose(2, 0, 1, 3).reshape(128, 288)
    else:
        wk = w2.reshape(9 * 128, 32)
    return pl.pallas_call(
        kernel,
        grid=(B, n),
        in_specs=[
            pl.BlockSpec((1, TH, W, 128), lambda i, t: (i, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, W, 128), lambda i, t: (i, t, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wk.shape, lambda i, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, W, 32), lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, 32), g.dtype),
        interpret=INTERPRET,
    )(g, halo, wk.astype(g.dtype))


if __name__ == "__main__":
    from fdgan_tpu.ops.pallas_dense import build_halo

    segs = [u(i, (B, H, W, c)) for i, c in enumerate(SEGS)]
    xcat = jnp.concatenate(segs, axis=-1)
    a = u(10, (C,), jnp.float32) + 0.5
    b = u(11, (C,), jnp.float32) - 0.5
    w1 = u(12, (C, 128))

    y_seg = seg_conv1(segs, a, b, w1)
    y_mono = mono_conv1(xcat, a, b, w1)
    err = float(jnp.max(jnp.abs(y_seg.astype(jnp.float32) - y_mono.astype(jnp.float32))))
    print("Q1 numerics: max |seg - mono| =", err)

    fl1 = 2 * B * H * W * C * 128
    nb1 = B * H * W * (C + 128) * 2
    timed(lambda s0, *r: seg_conv1((s0, *r[:3]), a, b, w1), tuple(segs),
          "Q1 conv1 from 4 segments", fl1, nb1)
    timed(lambda x: mono_conv1(x, a, b, w1), (xcat,), "Q1 conv1 from 1 concat", fl1, nb1)

    g = u(20, (B, H, W, 128))
    halo = build_halo(g, TH)
    w2 = u(21, (3, 3, 128, 32))
    fl2 = 2 * B * H * W * 9 * 128 * 32
    nb2 = B * H * W * (128 + 32) * 2
    timed(lambda g: conv2(g, halo, w2, _conv2_9dot_kernel, packed=False), (g,),
          "Q2 conv2 9-dot loop", fl2, nb2)
    if INTERPRET:
        # the packed kernel only runs in interpret mode: on real TPUs Mosaic
        # rejects the (M,288)->(th,w,3,3,32) reshape ("unsupported shape
        # cast") — and Q1's 9.2 TF/s in-kernel MXU ceiling makes the design
        # moot regardless (see PERFORMANCE.md dead-ends, r2)
        y9 = conv2(g, halo, w2, _conv2_9dot_kernel, packed=False)
        yp = conv2(g, halo, w2, _conv2_packed_kernel, packed=True)
        errp = float(jnp.max(jnp.abs(y9.astype(jnp.float32) - yp.astype(jnp.float32))))
        print("Q2 numerics: max |packed - 9dot| =", errp)
