"""Is the Pallas bandwidth cap actually an MXU cap? Time the REAL fused
dense layer (ops/pallas_dense.py) on TPU at block1 shapes and compare with
the XLA sequence it replaces.

Round-1 probes measured pallas matmul at ~12-13 TF/s, but those matmuls were
bandwidth-bound (≈185-200 GB/s): the rate says nothing about MXU throughput
once data is VMEM-resident. The fused layer moves ~8x less HBM traffic than
the XLA path (x read once, f written once; t/h/g never leave VMEM), so even
at a 200 GB/s DMA cap it wins IF the in-VMEM matmuls run fast.
"""
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from fdgan_tpu.ops.pallas_dense import fused_dense_layer, h_batch_stats, fold_bn
from fdgan_tpu.nn.layers import CONV_DIMS

B, H, W = 8, 512, 512
k = jax.random.PRNGKey
u = lambda s, sh, dt=jnp.bfloat16: jax.random.uniform(k(s), sh, dt)


def timed(fn, args, label, flops=0, nbytes=0, iters=10):
    @jax.jit
    def loop(*a):
        def body(i, c):
            y = fn(a[0] + c * jnp.asarray(1e-6, a[0].dtype), *a[1:])
            return jnp.max(jnp.abs(y)).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.bfloat16))
    float(loop(*args))
    t0 = time.perf_counter(); float(loop(*args)); dt = (time.perf_counter() - t0) / iters
    print(f"{label:46s} {dt*1000:7.2f} ms  {flops/dt/1e12:6.1f} TF/s  {nbytes/dt/1e9:5.0f} GB/s",
          flush=True)


for C in (64, 160, 224):
    x = u(1, (B, H, W, C))
    a1 = u(2, (C,), jnp.float32) + 0.5
    b1 = u(3, (C,), jnp.float32) - 0.5
    w1 = u(4, (C, 128))
    a2 = u(5, (128,), jnp.float32) + 0.5
    b2 = u(6, (128,), jnp.float32) - 0.5
    w2 = u(7, (3, 3, 128, 32))
    fl = 2 * B * H * W * (C * 128 + 9 * 128 * 32)
    nb = B * H * W * (C + 32) * 2

    for th in (8, 16):
        timed(lambda x, *a: fused_dense_layer(x, *a, tile_h=th),
              (x, a1, b1, w1, a2, b2, w2), f"pallas fused layer C={C} tile_h={th}", fl, nb)

    # the XLA sequence it replaces (running-stats mode: no stats pass)
    def xla_layer(x, a1, b1, w1, a2, b2, w2):
        t = jnp.maximum(x * a1.astype(x.dtype) + b1.astype(x.dtype), 0)
        h = jax.lax.conv_general_dilated(
            t, w1.reshape(1, 1, C, 128), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=CONV_DIMS)
        g = jnp.maximum(h * a2.astype(x.dtype) + b2.astype(x.dtype), 0)
        return jax.lax.conv_general_dilated(
            g, w2, (1, 1), [(1, 1), (1, 1)], dimension_numbers=CONV_DIMS)
    timed(xla_layer, (x, a1, b1, w1, a2, b2, w2), f"xla layer (running mode) C={C}", fl, nb)

    # phase-A stats kernel
    timed(lambda x, a1, b1, w1: h_batch_stats(x, a1, b1, w1)[0],
          (x, a1, b1, w1), f"pallas h-stats C={C}", 2 * B * H * W * C * 128,
          B * H * W * C * 2)
