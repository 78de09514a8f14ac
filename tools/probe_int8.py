"""int8 vs bf16 conv throughput, with real data dependencies."""
import time
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
DIMS = ("NHWC", "HWIO", "NHWC")
B, H, W = 8, 512, 512

def timed(fn, x, w, label, flops, iters=10):
    is_int = jnp.issubdtype(x.dtype, jnp.integer)
    @jax.jit
    def loop(x, w):
        def body(i, c):
            if is_int:
                xi = x + (i % 2).astype(x.dtype)   # cheap per-iter perturbation
            else:
                xi = x + (i % 2).astype(x.dtype) * jnp.asarray(1e-6, x.dtype)
            y = fn(xi, w)
            return c + jnp.max(y.astype(jnp.float32)) * 1e-9
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))
    float(loop(x, w))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter(); float(loop(x, w)); best = min(best, (time.perf_counter()-t0)/iters)
    print(f"{label:38s} {best*1000:7.2f} ms  {flops/best/1e12:6.1f} TOP/s")

k = jax.random.PRNGKey
xi = jax.random.randint(k(0), (B, H, W, 128), -100, 100, jnp.int8)
wi = jax.random.randint(k(1), (3, 3, 128, 32), -100, 100, jnp.int8)
fl = 2 * B*H*W * 9*128*32

conv_i8 = lambda x, w: lax.conv_general_dilated(x, w, (1,1), [(1,1),(1,1)], dimension_numbers=DIMS, preferred_element_type=jnp.int32)
conv_bf = lambda x, w: lax.conv_general_dilated(x, w, (1,1), [(1,1),(1,1)], dimension_numbers=DIMS)

try:
    timed(conv_i8, xi, wi, "conv3x3 128->32 int8", fl)
except Exception as e:
    print("int8 conv failed:", type(e).__name__, str(e)[:150])
timed(conv_bf, xi.astype(jnp.bfloat16), wi.astype(jnp.bfloat16), "conv3x3 128->32 bf16", fl)

x1 = jax.random.randint(k(2), (B, H, W, 160), -100, 100, jnp.int8)
w1 = jax.random.randint(k(3), (1, 1, 160, 128), -100, 100, jnp.int8)
fl1 = 2*B*H*W*160*128
c1_i8 = lambda x, w: lax.conv_general_dilated(x, w, (1,1), [(0,0),(0,0)], dimension_numbers=DIMS, preferred_element_type=jnp.int32)
try:
    timed(c1_i8, x1, w1, "conv1x1 160->128 int8", fl1)
except Exception as e:
    print("int8 conv1x1 failed:", type(e).__name__, str(e)[:150])
timed(conv_bf, x1.astype(jnp.bfloat16), w1.astype(jnp.bfloat16), "conv1x1 160->128 bf16", fl1)
