"""Training-step throughput on the live chip (BASELINE config 4: full
adversarial training — G + fusion-D + SSIM; perceptual off without VGG
weights). Same single-dispatch methodology as bench.py."""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fdgan_tpu.losses.composite import LossWeights
from fdgan_tpu.train.loop import create_train_state, make_train_step

BATCH, SIZE = 4, 256

state, tx_g, tx_d = create_train_state(jax.random.PRNGKey(0))
step = make_train_step(tx_g, tx_d, LossWeights(perceptual=0.0), compute_dtype=jnp.bfloat16)

haze = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, SIZE, SIZE, 3))
gt = jax.random.uniform(jax.random.PRNGKey(2), (BATCH, SIZE, SIZE, 3))
rng = jax.random.PRNGKey(3)

# warm/compile
state, metrics = step(state, haze, gt, rng)
jax.block_until_ready(metrics["g_total"])
float(metrics["g_total"])

ITERS = 10
t0 = time.perf_counter()
for i in range(ITERS):
    state, metrics = step(state, haze, gt, jax.random.fold_in(rng, i))
# one final sync through a scalar fetch
g = float(metrics["g_total"])
dt = time.perf_counter() - t0
print(
    f"train step {BATCH}@{SIZE}² bf16: {dt / ITERS * 1000:.1f} ms/step → "
    f"{BATCH * ITERS / dt:.2f} img/s (g_loss {g:.3f})"
)
