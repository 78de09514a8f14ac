"""Isolate pallas streaming bandwidth: pure copy kernel, parallel semantics,
and matmul with 'parallel' dimension."""
import time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
M, K = 8 * 512 * 512, 128

def timeit(fn, a, b=None, nbytes=0, label=""):
    @jax.jit
    def loop(a, *rest):
        def body(i, c):
            y = fn(a + c * jnp.asarray(1e-6, a.dtype), *rest)
            return jnp.max(jnp.abs(y)).astype(a.dtype)
        return jax.lax.fori_loop(0, 20, body, jnp.zeros((), a.dtype))
    args = (a,) if b is None else (a, b)
    float(loop(*args))
    t0 = time.perf_counter(); float(loop(*args)); dt = (time.perf_counter()-t0)/20
    print(f"{label:28s}: {dt*1000:7.3f} ms → {nbytes/dt/1e9:6.0f} GB/s")

a = jax.random.uniform(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
b = jax.random.uniform(jax.random.PRNGKey(1), (K, 128), jnp.bfloat16)
BYTES = M*K*2*2  # read + write

def copy_kernel(a_ref, o_ref):
    o_ref[:] = a_ref[:] * 2.0

for TM, sem in ((2048, "parallel"), (8192, "parallel")):
    @jax.jit
    def pcopy(a, TM=TM, sem=sem):
        return pl.pallas_call(
            copy_kernel,
            grid=(M // TM,),
            in_specs=[pl.BlockSpec((TM, K), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TM, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, K), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(dimension_semantics=(sem,)),
        )(a)
    timeit(pcopy, a, nbytes=BYTES, label=f"pallas copy TM={TM} {sem}")

@jax.jit
def xcopy(a):
    return a * 2.0
timeit(xcopy, a, nbytes=BYTES, label="xla copy")

def mm_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32).astype(o_ref.dtype)

@jax.jit
def pmm(a, b):
    return pl.pallas_call(
        mm_kernel,
        grid=(M // 4096,),
        in_specs=[
            pl.BlockSpec((4096, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4096, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, 128), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )(a, b)
timeit(pmm, a, b, nbytes=M*K*2 + M*128*2, label="pallas mm parallel")
