"""Does XLA fuse int8<->bf16 converts into conv operands/results on this TPU?

The encoder is HBM-bandwidth-bound (PERFORMANCE.md roofline: ~90 GB/batch-8
forward at 512²). If activations can live in HBM as int8 (half of bf16) with
the dequant fused into the conv's operand read and the requant into its
epilogue, conv-adjacent traffic halves and the ~48 img/s roofline moves.
tools/probe_int8.py only measured int8 *compute* (MXU-starved at N=32 → 1.25×);
this probes int8 *storage*.

Three timings per shape, all with real data dependencies (buffers passed as
jit ARGUMENTS — closed-over buffers become HLO constants and overflow the
axon remote-compile request):
  A. bf16-resident input  -> conv_bf16                      (baseline)
  B. int8-resident input  -> convert bf16 -> conv_bf16      (read fusion?)
  C. int8 in + int8 out   -> convert -> conv -> scale+round->int8 (both?)
If B beats A by ~the input-traffic ratio the convert fused; if B ≈ A plus a
convert pass, it materialised and the lever is dead.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
DIMS = ("NHWC", "HWIO", "NHWC")
B, H, W = 8, 512, 512
ITERS = 10


def timed(label, loop, x, w):
    float(loop(x, w))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        float(loop(x, w))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{label:44s} {best*1000:7.2f} ms")
    return best


def run_shape(cin, cout, kk, pad):
    print(f"--- conv{kk}x{kk} {cin}->{cout} @{H}x{W} batch {B} ---")
    k = jax.random.PRNGKey
    w_bf = jax.random.normal(k(1), (kk, kk, cin, cout), jnp.bfloat16) * 0.05
    x_bf = jax.random.normal(k(0), (B, H, W, cin), jnp.bfloat16)
    x_i8 = jax.random.randint(k(0), (B, H, W, cin), -127, 127, jnp.int8)

    def conv(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), [(pad, pad), (pad, pad)], dimension_numbers=DIMS
        )

    @jax.jit
    def loop_a(x, w):
        def body(i, c):
            y = conv(x + c.astype(jnp.bfloat16), w)
            return jnp.max(y).astype(jnp.float32) * 1e-9
        return lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    @jax.jit
    def loop_b(x, w):
        def body(i, c):
            # carried dependency: xi depends on c, c on the previous y —
            # iterations serialise and cannot be CSE'd/dead-coded
            xi = x + (c.astype(jnp.int32) % 2).astype(jnp.int8)
            y = conv(xi.astype(jnp.bfloat16) * jnp.bfloat16(1 / 127), w)
            return jnp.max(y).astype(jnp.float32) * 1e-9
        return lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    @jax.jit
    def loop_c(x, w):
        def body(i, carry):
            xi = x + (carry % 2).astype(jnp.int8)
            y = conv(xi.astype(jnp.bfloat16) * jnp.bfloat16(1 / 127), w)
            q = jnp.clip(jnp.round(y.astype(jnp.float32) * 127.0), -127, 127).astype(jnp.int8)
            return jnp.max(q)
        return lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.int8)).astype(jnp.float32)

    a = timed("A bf16 in / bf16 out", loop_a, x_bf, w_bf)
    b = timed("B int8-resident in / bf16 out", loop_b, x_i8, w_bf)
    c = timed("C int8-resident in / int8 out", loop_c, x_i8, w_bf)
    bytes_a = B * H * W * (cin * 2 + cout * 2)
    print(f"   A moves {bytes_a/1e9:.2f} GB min; B saves {B*H*W*cin/1e9:.2f} GB if fused"
          f" -> speedups B {a/b:.2f}x C {a/c:.2f}x")


if __name__ == "__main__":
    run_shape(128, 32, 3, 1)   # the dense-block conv2 (structural floor)
    run_shape(160, 128, 1, 0)  # a transition/conv1-style 1x1
