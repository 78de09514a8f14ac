"""BASELINE config 3: high-res (>=1600px) halo-tiled inference on one chip.

Usage: bench_highres.py [--size N] [--tile T] [--halo H] [--untiled]
The tiled path's per-tile memory is constant, so resolution scales by tile
count alone — 2048^2/4096^2 run on one chip where the monolithic forward
cannot (the plain 8@512^2 TRAIN step already exceeds HBM; see
PERFORMANCE.md).  --untiled also times the monolithic forward and checks
tiled-vs-untiled error (only feasible up to ~1600^2).
"""
import argparse
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fdgan_tpu.dist.tiling import tiled_apply
from fdgan_tpu.models import fdgan, fdgan_fast
from fdgan_tpu.nn.tree import cast_tree

ap = argparse.ArgumentParser()
ap.add_argument("--size", type=int, default=1600)
ap.add_argument("--tile", type=int, default=512)
ap.add_argument("--halo", type=int, default=128)
ap.add_argument("--untiled", action="store_true", help="also run the monolithic forward and compare")
opt = ap.parse_args()

params = cast_tree(fdgan.init(jax.random.PRNGKey(0)), jnp.bfloat16)
H = W = opt.size
x = jax.random.uniform(jax.random.PRNGKey(1), (1, H, W, 3), jnp.bfloat16)

fwd = jax.jit(lambda p, t: fdgan_fast.apply(p, t, bn_mode="running"))

def run(p, v):
    return tiled_apply(lambda t: fwd(p, t), v, tile=opt.tile, halo=opt.halo)

y = run(params, x)
s = float(jnp.mean(jnp.abs(y.astype(jnp.float32))))  # sync
t0 = time.perf_counter()
y = run(params, x)
s = float(jnp.mean(jnp.abs(y.astype(jnp.float32))))
dt = time.perf_counter() - t0
print(f"tiled {H}x{W} (tile {opt.tile}, halo {opt.halo}): {dt:.2f} s/img, out {y.shape}, mean|y| {s:.3f}")

if opt.untiled:
    try:
        t0 = time.perf_counter()
        y2 = fwd(params, x)
        s2 = float(jnp.mean(jnp.abs(y2.astype(jnp.float32))))
        dt2 = time.perf_counter() - t0
        print(f"untiled {H}x{W}: {dt2:.2f} s (incl compile), mean|y| {s2:.3f}")
        err = float(jnp.max(jnp.abs((y - y2).astype(jnp.float32))))
        print(f"tiled vs untiled max err: {err:.4f}")
    except Exception as e:
        print(f"untiled {H}^2 failed: {type(e).__name__} (memory-bound as expected)")
