"""Does XLA:TPU fuse a pre-conv elementwise chain (shift+relu) into the conv
operand read, or materialise it to HBM?

Decides whether running-BN mode has headroom left: with all BN affines
algebraically folded into conv weights, each dense layer still needs
`relu(x + shift_i)` on its concat input (layer-specific shift — cannot be
fused into producers). If XLA reads that through the conv for free, the
fully-folded running forward would approach ~80 ms (vs 145 measured); if it
materialises, the measured 145 ms IS the XLA roofline for this graph shape.

  A. conv1x1(x)                 — baseline
  B. conv1x1(relu(x + shift))   — the dense-layer pattern
  C. relu(x + shift) alone      — the materialisation cost if not fused
If B ≈ A: fused (headroom exists). If B ≈ A + C: materialised (no headroom).
"""
import time

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
DIMS = ("NHWC", "HWIO", "NHWC")
B, H, W, CIN, COUT = 8, 512, 512, 288, 128
# 50 on-device iterations per dispatch: the ~100-140 ms axon dispatch
# latency amortises to <0.3 ms/iter, well below the ~5 ms materialisation
# cost the B-A comparison must resolve
ITERS = 50


def bench(label, loop, *args):
    loop = jax.jit(loop)
    float(loop(*args))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{label:34s} {best*1000:7.2f} ms")
    return best


def main():
    k = jax.random.PRNGKey
    x = jax.random.normal(k(0), (B, H, W, CIN), jnp.bfloat16)
    w = jax.random.normal(k(1), (1, 1, CIN, COUT), jnp.bfloat16) * 0.05
    s = jax.random.normal(k(2), (CIN,), jnp.bfloat16)

    def conv(x, w):
        return lax.conv_general_dilated(x, w, (1, 1), [(0, 0), (0, 0)], dimension_numbers=DIMS)

    def loop_a(x, w):
        def body(i, c):
            y = conv(x + c.astype(x.dtype), w)
            return jnp.max(y).astype(jnp.float32) * 1e-9
        return lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    def loop_b(x, w, s):
        def body(i, c):
            y = conv(jax.nn.relu(x + s + c.astype(x.dtype)), w)
            return jnp.max(y).astype(jnp.float32) * 1e-9
        return lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    def loop_c(x, s):
        def body(i, c):
            y = jax.nn.relu(x + s + c.astype(x.dtype))
            return jnp.max(y).astype(jnp.float32) * 1e-9
        return lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    a = bench("A conv1x1 288->128", loop_a, x, w)
    b = bench("B conv1x1(relu(x+shift))", loop_b, x, w, s)
    c = bench("C relu(x+shift) alone", loop_c, x, s)
    print(f"B-A = {1000*(b-a):.2f} ms vs C = {1000*c:.2f} ms "
          f"-> {'FUSED (headroom in running mode)' if b - a < 0.4 * c else 'MATERIALISED (no headroom)'}")


if __name__ == "__main__":
    main()
