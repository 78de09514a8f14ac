"""BASELINE config 3: high-res (>=1600px) halo-tiled inference on one chip."""
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from fdgan_tpu.dist.tiling import tiled_apply
from fdgan_tpu.models import fdgan, fdgan_fast
from fdgan_tpu.nn.tree import cast_tree

params = cast_tree(fdgan.init(jax.random.PRNGKey(0)), jnp.bfloat16)
H = W = 1600
x = jax.random.uniform(jax.random.PRNGKey(1), (1, H, W, 3), jnp.bfloat16)

fwd = jax.jit(lambda p, t: fdgan_fast.apply(p, t, bn_mode="running"))

def run(p, v):
    return tiled_apply(lambda t: fwd(p, t), v, tile=512, halo=128)

y = run(params, x)
s = float(jnp.mean(jnp.abs(y.astype(jnp.float32))))  # sync
t0 = time.perf_counter()
y = run(params, x)
s = float(jnp.mean(jnp.abs(y.astype(jnp.float32))))
dt = time.perf_counter() - t0
print(f"tiled 1600x1600 (tile 512, halo 128): {dt:.2f} s/img, out {y.shape}, mean|y| {s:.3f}")

# also: untiled at 1600^2 — does it even fit?
try:
    t0 = time.perf_counter()
    y2 = fwd(params, x)
    s2 = float(jnp.mean(jnp.abs(y2.astype(jnp.float32))))
    dt2 = time.perf_counter() - t0
    print(f"untiled 1600x1600: {dt2:.2f} s (incl compile), mean|y| {s2:.3f}")
    err = float(jnp.max(jnp.abs((y - y2).astype(jnp.float32))))
    print(f"tiled vs untiled max err: {err:.4f}")
except Exception as e:
    print(f"untiled 1600^2 failed: {type(e).__name__} (memory-bound as expected)")
