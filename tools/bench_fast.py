"""fdgan vs fdgan_fast throughput at 512^2 bf16 batch 8."""
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from fdgan_tpu.models import fdgan, fdgan_fast
from fdgan_tpu.nn.tree import cast_tree

params = cast_tree(fdgan.init(jax.random.PRNGKey(0)), jnp.bfloat16)
x = jax.random.uniform(jax.random.PRNGKey(1), (8, 512, 512, 3), jnp.bfloat16)

def timed(fn, mode, label, iters=10):
    @jax.jit
    def loop(p, v):
        def body(i, c):
            y = fn(p, v + c * jnp.asarray(1e-6, v.dtype), bn_mode=mode)
            return jnp.max(jnp.abs(y)).astype(v.dtype)
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), v.dtype))
    float(loop(params, x))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter(); float(loop(params, x)); best = min(best, time.perf_counter()-t0)
    print(f"{label:32s} {best/iters*1000:8.2f} ms → {8*iters/best:7.1f} img/s")

timed(fdgan_fast.apply, "batch", "fast batch BN")
timed(fdgan_fast.apply, "running", "fast running BN")
timed(fdgan.apply, "batch", "base batch BN")
