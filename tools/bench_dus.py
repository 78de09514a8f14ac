"""Does a DUS-grown preallocated concat buffer beat per-layer jnp.concatenate?
Block2-like shapes (12 layers, 256px, 128->512ch)."""
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from fdgan_tpu.models import densenet
from fdgan_tpu.models.fdgan_fast import _SegStats, _dense_layer_fast

B, H, W, C0, L = 8, 256, 256, 128, 12
params = densenet.dense_block_init(jax.random.PRNGKey(0), C0, L, jnp.float32)
x = jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, C0), jnp.bfloat16)

def block_concat(p, x):
    stats = _SegStats(x, "batch")
    for i in range(L):
        f = _dense_layer_fast(p[f"denselayer{i+1}"], x, stats)
        stats.append(f)
        x = jnp.concatenate([x, f], axis=-1)
    return x

def block_dus(p, x):
    stats = _SegStats(x, "batch")
    total = C0 + 32 * L
    buf = jnp.zeros((B, H, W, total), x.dtype)
    buf = jax.lax.dynamic_update_slice(buf, x, (0, 0, 0, 0))
    c = C0
    for i in range(L):
        cur = jax.lax.slice_in_dim(buf, 0, c, axis=3)
        f = _dense_layer_fast(p[f"denselayer{i+1}"], cur, stats)
        stats.append(f)
        buf = jax.lax.dynamic_update_slice(buf, f, (0, 0, 0, c))
        c += 32
    return buf

import numpy as np
ra = jax.jit(block_concat)(params, x)
rb = jax.jit(block_dus)(params, x)
print("equal:", float(jnp.max(jnp.abs(ra.astype(jnp.float32) - rb.astype(jnp.float32)))))

def timed(fn, label, iters=8):
    @jax.jit
    def loop(p, v):
        def body(i, c):
            y = fn(p, v + c * jnp.asarray(1e-6, v.dtype))
            return jnp.max(jnp.abs(y)).astype(v.dtype)
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), v.dtype))
    float(loop(params, x))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter(); float(loop(params, x)); best = min(best, (time.perf_counter()-t0)/iters)
    print(f"{label:18s} {best*1000:8.2f} ms")

timed(block_concat, "concat")
timed(block_dus, "dus buffer")
