"""Batch-size scaling of the flagship forward at 512^2 bf16."""
import sys, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from fdgan_tpu.models import fdgan
from fdgan_tpu.nn.tree import cast_tree

params = cast_tree(fdgan.init(jax.random.PRNGKey(0)), jnp.bfloat16)

def timed(batch, mode, iters=8):
    @jax.jit
    def loop(p, v):
        def body(i, carry):
            y = fdgan.apply(p, v + carry * jnp.asarray(1e-6, v.dtype), bn_mode=mode)
            return jnp.max(jnp.abs(y)).astype(v.dtype)
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), v.dtype))
    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, 512, 512, 3), jnp.bfloat16)
    try:
        float(loop(params, x))
    except Exception as e:
        print(f"batch={batch} {mode}: FAILED {type(e).__name__}")
        return
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter(); float(loop(params, x)); best = min(best, time.perf_counter()-t0)
    print(f"batch={batch:3d} {mode:8s}: {best/iters*1000:8.2f} ms → {batch*iters/best:7.1f} img/s")

for b in (8, 16, 32):
    timed(b, "batch")
timed(16, "running")
