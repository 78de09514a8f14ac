"""Training-step throughput on the live chip (BASELINE config 4: full
adversarial training — G + fusion-D + SSIM; perceptual off without VGG
weights). Same single-dispatch methodology as bench.py.

--accum / --remat exercise the high-res memory levers (gradient
accumulation over microbatches, rematerialised G forward)."""

import argparse
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fdgan_tpu.losses.composite import LossWeights
from fdgan_tpu.train.loop import create_train_state, make_train_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--height", type=int, default=0,
                    help="override H (e.g. an H-slab standing in for one "
                         "shard of a spatially-sharded step: 2048² 2-way "
                         "≈ 1024x2048 per shard)")
    ap.add_argument("--width", type=int, default=0, help="override W")
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--stages", action="store_true",
                    help="stage-level remat (remat='stages'): max memory, ~13% slower")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    remat = "stages" if args.stages else args.remat
    state, tx_g, tx_d = create_train_state(jax.random.PRNGKey(0))
    step = make_train_step(
        tx_g, tx_d, LossWeights(perceptual=0.0), compute_dtype=jnp.bfloat16,
        accum_steps=args.accum, remat=remat,
    )

    H = args.height or args.size
    W = args.width or args.size
    haze = jax.random.uniform(jax.random.PRNGKey(1), (args.batch, H, W, 3))
    gt = jax.random.uniform(jax.random.PRNGKey(2), (args.batch, H, W, 3))
    rng = jax.random.PRNGKey(3)

    # warm/compile
    state, metrics = step(state, haze, gt, rng)
    jax.block_until_ready(metrics["g_total"])
    float(metrics["g_total"])

    t0 = time.perf_counter()
    for i in range(args.iters):
        state, metrics = step(state, haze, gt, jax.random.fold_in(rng, i))
    # one final sync through a scalar fetch
    g = float(metrics["g_total"])
    dt = time.perf_counter() - t0
    print(
        f"train step {args.batch}@{H}x{W} bf16 accum={args.accum} "
        f"remat={remat}: {dt / args.iters * 1000:.1f} ms/step → "
        f"{args.batch * args.iters / dt:.2f} img/s (g_loss {g:.3f})"
    )


if __name__ == "__main__":
    main()
