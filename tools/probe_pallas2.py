"""Tune the pallas matmul tile size; target >=400 GB/s effective."""
import time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
M, K, N = 8 * 512 * 512, 128, 128

def run(TM):
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
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(a, b)
    a = jax.random.uniform(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
    b = jax.random.uniform(jax.random.PRNGKey(1), (K, N), jnp.bfloat16)
    @jax.jit
    def loop(a, b):
        def body(i, c):
            y = pallas_mm(a + c * jnp.asarray(1e-6, a.dtype), b)
            return jnp.max(jnp.abs(y)).astype(a.dtype)
        return jax.lax.fori_loop(0, 20, body, jnp.zeros((), a.dtype))
    float(loop(a, b))
    t0 = time.perf_counter(); float(loop(a, b)); dt = (time.perf_counter() - t0) / 20
    gbs = (M*K*2 + M*N*2) / dt / 1e9
    print(f"TM={TM:6d}: {dt*1000:.3f} ms → {gbs:.0f} GB/s eff")

for tm in (2048, 4096, 8192):
    try:
        run(tm)
    except Exception as e:
        print(f"TM={tm}: failed {type(e).__name__}: {e}")
