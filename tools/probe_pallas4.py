"""Manual double-buffered copy kernel: can hand-rolled DMA overlap beat the
auto-pipeline's 200 GB/s?"""
import time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
M, K = 8 * 512 * 512, 128
CHUNK = 8192
NCHUNK = M // CHUNK

def dbuf_kernel(x_hbm, o_hbm):
    def body(scratch_in, scratch_out, sem_in, sem_out):
        def get_in(slot, idx):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(idx * CHUNK, CHUNK), :], scratch_in.at[slot], sem_in.at[slot])
        def put_out(slot, idx):
            return pltpu.make_async_copy(
                scratch_out.at[slot], o_hbm.at[pl.ds(idx * CHUNK, CHUNK), :], sem_out.at[slot])
        get_in(0, 0).start()
        def loop(i, _):
            cur = i % 2
            nxt = (i + 1) % 2
            @pl.when(i + 1 < NCHUNK)
            def _():
                get_in(nxt, i + 1).start()
            get_in(cur, i).wait()
            scratch_out[cur] = scratch_in[cur] * 2.0
            @pl.when(i >= 2)
            def _():
                put_out(cur, i - 2).wait()
            put_out(cur, i).start()
            return 0
        jax.lax.fori_loop(0, NCHUNK, loop, 0)
        # drain
        pltpu.make_async_copy(scratch_out.at[(NCHUNK-2) % 2], o_hbm.at[pl.ds((NCHUNK-2)*CHUNK, CHUNK), :], sem_out.at[(NCHUNK-2) % 2]).wait()
        pltpu.make_async_copy(scratch_out.at[(NCHUNK-1) % 2], o_hbm.at[pl.ds((NCHUNK-1)*CHUNK, CHUNK), :], sem_out.at[(NCHUNK-1) % 2]).wait()

    pl.run_scoped(
        body,
        scratch_in=pltpu.VMEM((2, CHUNK, K), jnp.bfloat16),
        scratch_out=pltpu.VMEM((2, CHUNK, K), jnp.bfloat16),
        sem_in=pltpu.SemaphoreType.DMA((2,)),
        sem_out=pltpu.SemaphoreType.DMA((2,)),
    )

@jax.jit
def dbuf_copy(x):
    return pl.pallas_call(
        dbuf_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((M, K), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x)

a = jax.random.uniform(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
y = dbuf_copy(a)
import numpy as np
np.testing.assert_allclose(np.asarray(y[:64], np.float32), np.asarray(a[:64], np.float32) * 2, rtol=1e-2)
print("numerics ok")

@jax.jit
def loop(a):
    def body(i, c):
        y = dbuf_copy(a + c * jnp.asarray(1e-6, a.dtype))
        return jnp.max(jnp.abs(y)).astype(a.dtype)
    return jax.lax.fori_loop(0, 20, body, jnp.zeros((), a.dtype))
float(loop(a))
t0 = time.perf_counter(); float(loop(a)); dt = (time.perf_counter()-t0)/20
print(f"manual double-buffer copy: {dt*1000:.3f} ms → {M*K*2*2/dt/1e9:.0f} GB/s")
