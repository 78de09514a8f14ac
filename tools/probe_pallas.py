"""Probe: does Pallas deliver MXU throughput on this chip? Simple tiled
matmul (M=2^21, K=128, N=128) vs XLA dot."""
import time
import jax, jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

M, K, N = 8 * 512 * 512, 128, 128
TM = 1024

def mm_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32).astype(o_ref.dtype)

@jax.jit
def pallas_mm(a, b):
    return pl.pallas_call(
        mm_kernel,
        grid=(M // TM,),
        in_specs=[
            pl.BlockSpec((TM, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
    )(a, b)

@jax.jit
def xla_mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

a = jax.random.uniform(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
b = jax.random.uniform(jax.random.PRNGKey(1), (K, N), jnp.bfloat16)

for name, fn in (("pallas", pallas_mm), ("xla", xla_mm)):
    @jax.jit
    def loop(a, b, fn=fn):
        def body(i, c):
            y = fn(a + c * jnp.asarray(1e-6, a.dtype), b)
            return jnp.max(jnp.abs(y)).astype(a.dtype)
        return jax.lax.fori_loop(0, 20, body, jnp.zeros((), a.dtype))
    float(loop(a, b))
    t0 = time.perf_counter(); float(loop(a, b)); dt = (time.perf_counter() - t0) / 20
    tflops = 2 * M * K * N / dt / 1e12
    print(f"{name}: {dt*1000:.3f} ms → {tflops:.1f} TFLOP/s")

# correctness
import numpy as np
np.testing.assert_allclose(np.asarray(pallas_mm(a, b), np.float32), np.asarray(xla_mm(a, b), np.float32), rtol=2e-2)
print("numerics ok")
